"""Import reference-trained checkpoints into iisan_tpu parameter trees.

The reference persists ``{'model_state_dict': model.module.state_dict(),
'optimizer': ..., 'rng_state': ..., 'cuda_rng_state': ...}`` per epoch
(``Code_Cached/data_utils/utils.py:104-110``).  For the cached IISAN
model the state dict is compact — ``IISANAdaptedMModel`` keeps only the
adapter stacks, gates, head projections and the two borrowed tower heads
(``Code_Cached/model/model.py:257-302``), not the frozen towers — so a
migrating user can load their trained ``epoch-N.pt`` directly into this
framework for continued training or serving.

Mappings mirror the module-level weight copies proven numerically
equivalent in tests/test_reference_parity.py (SAN forward and SASRec
user encoder match the imported reference modules to fp32 tolerance);
here they operate on state-dict keys so no torch module construction is
needed.  Torch linear weights are (out, in) and transpose to Flax
(in, out) kernels; adapter ModuleLists stack into the (K, ...) grouped
tensors our vectorized cascades consume.

Wired into the trainer lifecycle: ``--pretrained_recsys_model
path/to/epoch-N.pt`` (the reference's own warm-start flag,
``Code_Cached/run.py:141-149``) detects the ``.pt`` suffix and routes
here; orbax checkpoints take the existing path.

Scope: the cached/cached_asym model families (``item_tower='modal'``,
any modality), the ID model, and uncached **FFT** (whose towers are
unmodified HF modules — imported through the proven
``models/{bert,vit}.params_from_hf_torch`` mappings plus the head
layers).  LoRA/Houlsby/uncached-IISAN checkpoints embed monkey-patched
tower modules and are rejected with guidance — rebuild caches or
re-finetune (adapters are cheap to retrain by design).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


class ImportError_(Exception):
    """Raised when a checkpoint does not match the expected layout."""


def _t2n(v) -> np.ndarray:
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def _lin(sd, name: str) -> Dict[str, np.ndarray]:
    return {"kernel": _t2n(sd[f"{name}.weight"]).T,
            "bias": _t2n(sd[f"{name}.bias"])}


def _ln(sd, name: str) -> Dict[str, np.ndarray]:
    return {"scale": _t2n(sd[f"{name}.weight"]),
            "bias": _t2n(sd[f"{name}.bias"])}


def user_encoder_params_from_reference(sd, prefix: str = "user_encoder."
                                       ) -> Dict:
    """SASRec tower: ``{prefix}transformer_encoder...`` state-dict keys ->
    our UserEncoder tree (mapping of tests/test_reference_parity.py::
    test_user_encoder_matches_reference)."""
    te = f"{prefix}transformer_encoder."
    if f"{te}position_embedding.weight" not in sd:
        raise ImportError_(f"no user encoder under '{prefix}'")
    out = {"position_embedding": _t2n(sd[f"{te}position_embedding.weight"]),
           "layer_norm": _ln(sd, f"{te}layer_norm")}
    i = 0
    while f"{te}transformer_blocks.{i}.multi_head_attention.w_Q.weight" in sd:
        blk = f"{te}transformer_blocks.{i}."
        out[f"transformer_blocks_{i}"] = {
            "multi_head_attention": {
                # reference projections are bias-free (modules.py:44-47)
                "w_Q": {"kernel": _t2n(
                    sd[blk + "multi_head_attention.w_Q.weight"]).T},
                "w_K": {"kernel": _t2n(
                    sd[blk + "multi_head_attention.w_K.weight"]).T},
                "w_V": {"kernel": _t2n(
                    sd[blk + "multi_head_attention.w_V.weight"]).T},
                "fc": {"kernel": _t2n(
                    sd[blk + "multi_head_attention.fc.weight"]).T},
                "layer_norm": _ln(sd, blk + "multi_head_attention.layer_norm"),
            },
            "feed_forward": {
                "w_1": _lin(sd, blk + "feed_forward.w_1"),
                "w_2": _lin(sd, blk + "feed_forward.w_2"),
                "layer_norm": _ln(sd, blk + "feed_forward.layer_norm"),
            },
        }
        i += 1
    if i == 0:
        raise ImportError_(f"no transformer blocks under '{te}'")
    return {"transformer_encoder": out}


def san_params_from_reference(sd, prefix: str = "mm_encoder.") -> Dict:
    """SAN: adapter ModuleLists -> stacked (K, ...) weight groups, gate
    ParameterLists -> (K,) arrays, head/pre-fc Linears -> Flax kernels
    (mapping of test_reference_parity.py::test_san_forward_matches_...).
    Absent branches (modality != intra_inter) are simply not emitted."""
    out: Dict = {}
    emitted = False
    for lst in ("bert_adapter_list", "cv_adapter_list", "mm_adapter_list"):
        wd, bd, wu, bu = [], [], [], []
        i = 0
        while f"{prefix}{lst}.{i}.fc_down.weight" in sd:
            wd.append(_t2n(sd[f"{prefix}{lst}.{i}.fc_down.weight"]).T)
            bd.append(_t2n(sd[f"{prefix}{lst}.{i}.fc_down.bias"]))
            wu.append(_t2n(sd[f"{prefix}{lst}.{i}.fc_up.weight"]).T)
            bu.append(_t2n(sd[f"{prefix}{lst}.{i}.fc_up.bias"]))
            i += 1
        if i:
            out[f"{lst}_wd"], out[f"{lst}_bd"] = np.stack(wd), np.stack(bd)
            out[f"{lst}_wu"], out[f"{lst}_bu"] = np.stack(wu), np.stack(bu)
            emitted = True
    for gates in ("side_gate_params_text", "side_gate_params_cv",
                  "side_gate_params_mm"):
        vals, i = [], 0
        while f"{prefix}{gates}.{i}" in sd:
            vals.append(_t2n(sd[f"{prefix}{gates}.{i}"]).reshape(-1)[0])
            i += 1
        if i:
            out[gates] = np.array(vals)
    for fc in ("fc_bert", "fc_cv", "fc_mm", "fc_mm_down",
               "cv_pre_fc", "bert_pre_fc"):
        if f"{prefix}{fc}.weight" in sd:
            out[fc] = _lin(sd, f"{prefix}{fc}")
            emitted = True
    # asym dim-transform list (down_project_list, Asym model.py:280-285)
    i = 0
    while f"{prefix}down_project_list.{i}.weight" in sd:
        out[f"down_project_list_{i}"] = _lin(
            sd, f"{prefix}down_project_list.{i}")
        i += 1
    if not emitted:
        raise ImportError_(f"no SAN modules under '{prefix}'")
    return out


_BERT_PREFIX = "mm_encoder.bert_encoder.text_encoders.title.bert_model."
_IMAGE_NET_PREFIX = "mm_encoder.cv_encoder.image_net."   # ViTForImageClsf.


def fft_params_from_reference(sd) -> Dict:
    """Uncached FFT: unmodified HF towers (run.py:53-81) + the replaced
    classifier / title fc heads -> our {text_tower, image_tower} trees
    via the HF import mappings proven bit-exact in tests/test_towers.py."""
    from ..models import bert as bert_mod
    from ..models import vit as vit_mod

    bert_sd = {k[len(_BERT_PREFIX):]: v for k, v in sd.items()
               if k.startswith(_BERT_PREFIX)}
    # keep the inner "vit." prefix — vit.params_from_hf_torch expects the
    # ViTForImageClassification layout
    vit_sd = {k[len(_IMAGE_NET_PREFIX):]: v for k, v in sd.items()
              if k.startswith(_IMAGE_NET_PREFIX + "vit.")}
    if not bert_sd or not vit_sd:
        raise ImportError_("FFT checkpoint missing tower weights under "
                           f"'{_BERT_PREFIX}' / '{_IMAGE_NET_PREFIX}vit.'")

    def n_layers(tower_sd, prefix=""):
        return 1 + max(int(k[len(prefix):].split(".")[2]) for k in tower_sd
                       if k.startswith(prefix + "encoder.layer."))

    return {
        "text_tower": {
            "bert": bert_mod.params_from_hf_torch(
                bert_sd, num_layers=n_layers(bert_sd)),
            "fc": _lin(sd,
                       "mm_encoder.bert_encoder.text_encoders.title.fc")},
        "image_tower": {
            "vit": vit_mod.params_from_hf_torch(
                vit_sd, num_layers=n_layers(vit_sd, "vit.")),
            "classifier": _lin(sd, _IMAGE_NET_PREFIX + "classifier")},
    }


def params_from_reference_checkpoint(ckpt, template: Optional[Dict] = None
                                     ) -> Dict:
    """Full checkpoint -> our param tree.

    ``ckpt``: path to an ``epoch-N.pt`` (save_model layout or a bare
    state_dict) or an already-loaded mapping.  ``template``: optional
    target tree (e.g. ``trainer.params``) — imported leaves are verified
    against it structure- and shape-wise and cast to its dtypes; leaves
    the checkpoint does not cover (none, for supported families) keep
    the template values.
    """
    if isinstance(ckpt, str):
        import torch

        ckpt = torch.load(ckpt, map_location="cpu", weights_only=True)
    sd = ckpt.get("model_state_dict", ckpt)

    out: Dict = {"user_encoder": user_encoder_params_from_reference(sd)}
    has_towers = any(k.startswith("mm_encoder.bert_encoder.") for k in sd)
    has_san = any(k.startswith(f"mm_encoder.{lst}.") for k in sd
                  for lst in ("bert_adapter_list", "cv_adapter_list",
                              "mm_adapter_list"))
    if has_towers and has_san:
        # uncached IISAN: towers registered directly on the adapted model
        # (Code_Uncached/model/model.py:169-170) alongside the adapters
        raise ImportError_(
            "uncached-IISAN checkpoints (towers + side network in one "
            "module) are not importable; train cached IISAN from rebuilt "
            "caches instead — the cached model is the same network")
    if has_towers:
        # tower-holding family (uncached): FFT imports cleanly; patched
        # towers do not
        if any(".lora_" in k or ".adapter." in k or ".self_output." in k
               for k in sd):
            raise ImportError_(
                "LoRA/Houlsby checkpoints embed monkey-patched tower "
                "modules and are not importable — re-finetune (adapters "
                "retrain cheaply) or import base towers from HF weights")
        out.update(fft_params_from_reference(sd))
    elif any(k.startswith("mm_encoder.") for k in sd):
        out["san"] = san_params_from_reference(sd)
    elif "id_embedding.weight" in sd:
        out["id_embedding"] = {"embedding": _t2n(sd["id_embedding.weight"])}
    else:
        raise ImportError_(
            "checkpoint has neither mm_encoder.* nor id_embedding.* keys — "
            "not a reference ModelMM state dict; see utils/torch_import.py")
    # ModelMM registers com_dense unconditionally, but in ID mode it is
    # never reachable (the reference's id forward is a dead path,
    # run.py:377 NameError) — our IDRecModel has no fuse layer, so drop
    # the registered-but-unused weights instead of failing the merge.
    if "com_dense.weight" in sd and "id_embedding" not in out:
        out["fuse"] = {"com_dense": _lin(sd, "com_dense")}

    if template is None:
        return out
    return _merge_into(template, out)


def reference_state_dict_from_params(params: Dict, modality: str =
                                     "intra_inter") -> Dict:
    """Inverse of the cached-family import: our {user_encoder, san, fuse}
    param tree -> a reference ModelMM state dict (torch tensors), so a
    model trained here can be evaluated or resumed with the reference's
    own tooling (``model.load_state_dict(ckpt['model_state_dict'])``,
    Code_Cached/run.py:146).  Covers the families the importer covers:
    cached/cached_asym SAN models and the ID model.

    Round-trip invariant (tested): ``params_from_reference_checkpoint(
    {'model_state_dict': reference_state_dict_from_params(p)}, p) == p``.
    """
    import torch

    sd: Dict = {}

    def _np32(x):
        x = np.asarray(x)
        # ml_dtypes bfloat16 reaches numpy as a void dtype torch rejects
        return x if x.dtype.kind in "iuf" else x.astype(np.float32)

    def tensor(x):
        return torch.tensor(_np32(x))

    def put_lin(name, leaf):
        sd[f"{name}.weight"] = tensor(np.asarray(_np32(leaf["kernel"])).T)
        sd[f"{name}.bias"] = tensor(leaf["bias"])

    te = params["user_encoder"]["transformer_encoder"]
    sd["user_encoder.transformer_encoder.position_embedding.weight"] = \
        tensor(te["position_embedding"])
    sd["user_encoder.transformer_encoder.layer_norm.weight"] = \
        tensor(te["layer_norm"]["scale"])
    sd["user_encoder.transformer_encoder.layer_norm.bias"] = \
        tensor(te["layer_norm"]["bias"])
    i = 0
    while f"transformer_blocks_{i}" in te:
        blk = te[f"transformer_blocks_{i}"]
        base = f"user_encoder.transformer_encoder.transformer_blocks.{i}"
        mha, ff = blk["multi_head_attention"], blk["feed_forward"]
        for proj in ("w_Q", "w_K", "w_V", "fc"):
            sd[f"{base}.multi_head_attention.{proj}.weight"] = tensor(
                np.asarray(_np32(mha[proj]["kernel"])).T)
        sd[f"{base}.multi_head_attention.layer_norm.weight"] = tensor(
            mha["layer_norm"]["scale"])
        sd[f"{base}.multi_head_attention.layer_norm.bias"] = tensor(
            mha["layer_norm"]["bias"])
        put_lin(f"{base}.feed_forward.w_1", ff["w_1"])
        put_lin(f"{base}.feed_forward.w_2", ff["w_2"])
        sd[f"{base}.feed_forward.layer_norm.weight"] = tensor(
            ff["layer_norm"]["scale"])
        sd[f"{base}.feed_forward.layer_norm.bias"] = tensor(
            ff["layer_norm"]["bias"])
        i += 1

    if "san" in params:
        san = params["san"]
        for lst in ("bert_adapter_list", "cv_adapter_list",
                    "mm_adapter_list"):
            if f"{lst}_wd" not in san:
                continue
            for j in range(np.asarray(san[f"{lst}_wd"]).shape[0]):
                for half, w, b in (("fc_down", "wd", "bd"),
                                   ("fc_up", "wu", "bu")):
                    sd[f"mm_encoder.{lst}.{j}.{half}.weight"] = tensor(
                        np.asarray(_np32(san[f"{lst}_{w}"][j])).T)
                    sd[f"mm_encoder.{lst}.{j}.{half}.bias"] = tensor(
                        san[f"{lst}_{b}"][j])
        for gates in ("side_gate_params_text", "side_gate_params_cv",
                      "side_gate_params_mm"):
            if gates in san:
                for j, v in enumerate(np.asarray(san[gates])):
                    sd[f"mm_encoder.{gates}.{j}"] = tensor(
                        np.asarray(_np32(v)).reshape(1))
        for fc in ("fc_bert", "fc_cv", "fc_mm", "fc_mm_down",
                   "cv_pre_fc", "bert_pre_fc"):
            if fc in san:
                put_lin(f"mm_encoder.{fc}", san[fc])
        j = 0
        while f"down_project_list_{j}" in san:
            put_lin(f"mm_encoder.down_project_list.{j}",
                    san[f"down_project_list_{j}"])
            j += 1
    elif "id_embedding" in params:
        sd["id_embedding.weight"] = tensor(
            params["id_embedding"]["embedding"])

    if "fuse" in params and "com_dense" in params["fuse"]:
        put_lin("com_dense", params["fuse"]["com_dense"])
    elif "id_embedding" in params:
        # ModelMM registers com_dense even in ID mode (never reachable
        # there); synthesize a fresh torch-default layer so the export
        # passes the reference's strict load_state_dict (run.py:146)
        emb = int(np.asarray(params["id_embedding"]["embedding"]).shape[1])
        lin = torch.nn.Linear(emb * 2, emb)
        sd["com_dense.weight"] = lin.weight.detach()
        sd["com_dense.bias"] = lin.bias.detach()
    return sd


def save_reference_checkpoint(params: Dict, path: str) -> None:
    """Write our params as a complete reference ``epoch-N.pt`` (the
    save_model layout incl. the rng fields ``run.py:148-149`` reads), so
    the file drops into the reference's ``--pretrained_recsys_model`` /
    ``--load_ckpt_name`` flow unmodified."""
    import torch

    torch.save({"model_state_dict": reference_state_dict_from_params(params),
                "optimizer": {},
                "rng_state": torch.get_rng_state(),
                "cuda_rng_state": torch.zeros(16, dtype=torch.uint8)}, path)


def _merge_into(template: Dict, imported: Dict, path: str = "") -> Dict:
    """Template-shaped tree with imported leaves substituted; loud errors
    on structure or shape mismatch (silent shape drift would train a
    different model than the user checkpointed)."""
    merged = {}
    for k, tv in template.items():
        p = f"{path}/{k}"
        if k not in imported:
            merged[k] = tv
            continue
        iv = imported[k]
        if isinstance(tv, dict) != isinstance(iv, dict):
            raise ImportError_(f"{p}: tree/leaf structure mismatch")
        if isinstance(tv, dict):
            merged[k] = _merge_into(tv, iv, p)
        else:
            if tuple(np.shape(iv)) != tuple(np.shape(tv)):
                raise ImportError_(
                    f"{p}: shape {np.shape(iv)} != expected {np.shape(tv)} "
                    "(checkpoint geometry does not match the config)")
            merged[k] = np.asarray(iv, dtype=np.asarray(tv).dtype)
    extra = set(imported) - set(template)
    if extra:
        raise ImportError_(f"{path}: imported keys {sorted(extra)} not in "
                           "the target tree")
    return merged
