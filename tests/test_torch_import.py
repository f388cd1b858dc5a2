"""Reference-checkpoint import (utils/torch_import.py).

Builds the reference's own torch modules (cached ModelMM component
naming), saves a checkpoint in the reference's save_model layout
(utils.py:104-110), imports it, and checks our model reproduces the
torch model's forward numerics — the user-visible contract of
``--pretrained_recsys_model epoch-N.pt``.
"""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference/Code_Cached"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference snapshot not mounted")

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from iisan_tpu.utils.torch_import import (ImportError_,
                                          params_from_reference_checkpoint)


@pytest.fixture(scope="module")
def ref_modules():
    sys.path.insert(0, REF)
    try:
        import model.encoders as ref_encoders
        import model.model as ref_model
        yield ref_model, ref_encoders
    finally:
        sys.path.remove(REF)
        for k in [k for k in sys.modules if k == "model" or
                  k.startswith("model.")]:
            del sys.modules[k]


def ref_args(**kw):
    base = dict(
        max_seq_len=4, embedding_dim=16, num_attention_heads=2,
        transformer_block=2, drop_rate=0.0, l2_weight=0.0,
        modality="intra_inter", fusion_method="gated", remove_first="None",
        side_adapter_vit_list="1,3", side_adapter_bert_list="1,3",
        side_adapter_mm_list="1,3", adapter_activation="RELU",
        bert_adapter_down_size=8, cv_adapter_down_size=8,
        adapter_dropout_rate=0.0, word_embedding_dim=768,
        CV_model_load="vit")
    base.update(kw)
    return types.SimpleNamespace(**base)


def build_reference_checkpoint(ref_model, ref_encoders, args, path):
    """Assemble the cached ModelMM state-dict layout: user_encoder.* +
    mm_encoder.* (IISANAdaptedMModel) + com_dense.* (model.py:14-41,
    run.py:182-184)."""
    torch.manual_seed(0)
    emb = args.embedding_dim

    class D:
        def __init__(self, d): self._d = d
        def __getattr__(self, k): return self._d[k]

    mm_stub = types.SimpleNamespace(
        cv_encoder=types.SimpleNamespace(
            image_net=types.SimpleNamespace(
                classifier=torch.nn.Linear(768, emb))),
        bert_encoder=types.SimpleNamespace(text_encoders=D(
            {"title": types.SimpleNamespace(fc=torch.nn.Linear(768, emb))})))
    san = ref_model.IISANAdaptedMModel(mm_stub, args).eval()
    with torch.no_grad():  # move gates off 0 so the import is observable
        for plist in (san.side_gate_params_text, san.side_gate_params_cv,
                      san.side_gate_params_mm):
            for p in plist:
                p.normal_(0, 0.5)
    ue = ref_encoders.User_Encoder(
        item_num=100, max_seq_len=args.max_seq_len, item_dim=emb,
        num_attention_heads=args.num_attention_heads, dropout=0.0,
        n_layers=args.transformer_block).eval()
    com_dense = torch.nn.Linear(emb * 3, emb)

    sd = {}
    sd.update({f"user_encoder.{k}": v for k, v in ue.state_dict().items()})
    sd.update({f"mm_encoder.{k}": v for k, v in san.state_dict().items()})
    sd.update({f"com_dense.{k}": v for k, v in com_dense.state_dict().items()})
    torch.save({"model_state_dict": sd, "optimizer": {},
                "rng_state": torch.get_rng_state(),
                "cuda_rng_state": torch.zeros(16, dtype=torch.uint8)}, path)
    return san, ue, com_dense


def our_model(args):
    from iisan_tpu.config import IISANConfig
    from iisan_tpu.models.model import rec_model_from_config

    cfg = IISANConfig(
        embedding_dim=args.embedding_dim, max_seq_len=args.max_seq_len,
        num_attention_heads=args.num_attention_heads,
        transformer_block=args.transformer_block, drop_rate=0.0,
        side_adapter_vit_list=args.side_adapter_vit_list,
        side_adapter_bert_list=args.side_adapter_bert_list,
        bert_adapter_down_size=args.bert_adapter_down_size,
        cv_adapter_down_size=args.cv_adapter_down_size,
        word_embedding_dim=768, image_embedding_dim=768,
        compute_dtype="float32")
    model = rec_model_from_config(cfg)
    k = len(cfg.san_image_taps())
    L = cfg.max_seq_len
    ids = jnp.zeros((2, L + 1), jnp.int32)
    cv = jnp.zeros((2 * (L + 1), k, 768), jnp.float32)
    tx = jnp.zeros_like(cv)
    lm = jnp.ones((2, L), jnp.float32)
    pop = jnp.ones((101,), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), ids, cv, tx, lm, pop)["params"]
    return model, params, cfg


def test_checkpoint_import_reproduces_reference_forward(ref_modules, tmp_path):
    ref_model, ref_encoders = ref_modules
    args = ref_args()
    path = str(tmp_path / "epoch-5.pt")
    san, ue, com_dense = build_reference_checkpoint(
        ref_model, ref_encoders, args, path)

    model, template, cfg = our_model(args)
    params = jax.tree_util.tree_map(
        jnp.asarray, params_from_reference_checkpoint(path, template))

    # reference forward: SAN on full 13-layer states -> com_dense -> SASRec
    rng = np.random.default_rng(0)
    L = args.max_seq_len
    n = 2 * (L + 1)
    cv13 = rng.standard_normal((n, 13, 768)).astype(np.float32)
    tx13 = rng.standard_normal((n, 13, 768)).astype(np.float32)
    log_mask = np.ones((2, L), np.float32)
    log_mask[1, :2] = 0
    with torch.no_grad():
        r_cv, (r_text, r_mm) = san(torch.tensor(cv13), torch.tensor(tx13))
        score_embs = com_dense(torch.cat([r_cv, r_text, r_mm], dim=1))
        input_embs = score_embs.view(2, L + 1, args.embedding_dim)
        want = ue(input_embs[:, :-1, :], torch.tensor(log_mask), "cpu")
    want = want.detach().numpy()

    taps = list(cfg.san_image_taps())
    emb_cv, emb_text, emb_mm = model.apply(
        {"params": params}, jnp.asarray(cv13[:, taps, :]),
        jnp.asarray(tx13[:, taps, :]), method=model.item_embeddings)
    fused = model.apply({"params": params}, emb_cv, emb_text, emb_mm,
                        method=model.fuse_embeddings)
    got = model.apply({"params": params},
                      fused.reshape(2, L + 1, -1)[:, :-1, :],
                      jnp.asarray(log_mask), method=model.user_scores)
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5)


def test_checkpoint_import_via_pretrained_flag(ref_modules, tmp_path):
    """--pretrained_recsys_model path.pt warm-starts a CachedTrainer with
    the imported reference weights (run.py:141-149 analog)."""
    from iisan_tpu.config import IISANConfig
    from iisan_tpu.data.synthetic import synthetic_corpus, synthetic_taps
    from iisan_tpu.train.cached import CachedTrainer

    ref_model, ref_encoders = ref_modules
    args = ref_args(max_seq_len=10)
    path = str(tmp_path / "epoch-7.pt")
    san, _, _ = build_reference_checkpoint(ref_model, ref_encoders, args,
                                           path)

    cfg = IISANConfig(
        batch_size=8, epoch=1, embedding_dim=16,
        side_adapter_vit_list="1,3", side_adapter_bert_list="1,3",
        bert_adapter_down_size=8, cv_adapter_down_size=8,
        word_embedding_dim=768, image_embedding_dim=768,
        compute_dtype="float32", eval_batch_size=16)
    corpus = synthetic_corpus(n_users=24, item_num=40)
    k = len(cfg.san_image_taps())
    tr = CachedTrainer(cfg, corpus, synthetic_taps(40, k, 768, 1),
                       synthetic_taps(40, k, 768, 2))
    from iisan_tpu.utils.torch_import import params_from_reference_checkpoint

    tr.params = jax.tree_util.tree_map(
        jnp.asarray, params_from_reference_checkpoint(path, tr.params))
    want_gate = torch.sigmoid(san.side_gate_params_text[1] / 0.1).item()
    got = tr.gate_values()
    assert np.isclose(got["side_gate_params_text"][1], want_gate,
                      atol=1e-6)
    tr.run_epoch(1)  # imported params train without error


def test_id_checkpoint_import(ref_modules, tmp_path):
    _, ref_encoders = ref_modules
    torch.manual_seed(3)
    ue = ref_encoders.User_Encoder(item_num=50, max_seq_len=4, item_dim=16,
                                   num_attention_heads=2, dropout=0.0,
                                   n_layers=2)
    id_emb = torch.nn.Embedding(51, 16, padding_idx=0)
    sd = {f"user_encoder.{k}": v for k, v in ue.state_dict().items()}
    sd["id_embedding.weight"] = id_emb.weight.detach()
    path = str(tmp_path / "id.pt")
    torch.save({"model_state_dict": sd}, path)

    out = params_from_reference_checkpoint(path)
    np.testing.assert_allclose(out["id_embedding"]["embedding"],
                               id_emb.weight.detach().numpy())
    assert "transformer_blocks_1" in out["user_encoder"]["transformer_encoder"]


def test_geometry_mismatch_is_loud(ref_modules, tmp_path):
    ref_model, ref_encoders = ref_modules
    args = ref_args(bert_adapter_down_size=12)   # checkpoint down-size 12
    path = str(tmp_path / "wrong.pt")
    build_reference_checkpoint(ref_model, ref_encoders, args, path)
    _, template, _ = our_model(ref_args())       # config expects 8
    with pytest.raises(ImportError_, match="shape"):
        params_from_reference_checkpoint(path, template)


def test_uncached_checkpoint_rejected(tmp_path):
    sd = {"user_encoder.transformer_encoder.position_embedding.weight":
          torch.zeros(4, 16),
          "user_encoder.transformer_encoder.layer_norm.weight":
          torch.ones(16),
          "user_encoder.transformer_encoder.layer_norm.bias":
          torch.zeros(16)}
    path = str(tmp_path / "unc.pt")
    torch.save({"model_state_dict": sd}, path)
    with pytest.raises(ImportError_):
        params_from_reference_checkpoint(path)


def test_fft_checkpoint_import(ref_modules, tmp_path):
    """Uncached FFT checkpoint (unmodified HF towers + replaced heads,
    run.py:53-81) imports into the FFT model tree; LoRA-style patched
    keys are rejected with guidance."""
    from transformers import (BertConfig, BertModel, ViTConfig,
                              ViTForImageClassification)

    from iisan_tpu.config import IISANConfig
    from iisan_tpu.train.uncached import build_uncached_model

    _, ref_encoders = ref_modules
    torch.manual_seed(4)
    emb = 16
    bert = BertModel(BertConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=128, vocab_size=30522,
        max_position_embeddings=512))
    vit = ViTForImageClassification(ViTConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=128, image_size=16, patch_size=16))
    vit.classifier = torch.nn.Linear(32, emb)      # run.py:58-61
    title_fc = torch.nn.Linear(32, emb)
    ue = ref_encoders.User_Encoder(item_num=30, max_seq_len=4, item_dim=emb,
                                   num_attention_heads=2, dropout=0.0,
                                   n_layers=2)
    com_dense = torch.nn.Linear(emb * 2, emb)      # non-inter modality

    sd = {f"user_encoder.{k}": v for k, v in ue.state_dict().items()}
    sd.update({f"mm_encoder.bert_encoder.text_encoders.title.bert_model.{k}":
               v for k, v in bert.state_dict().items()})
    sd.update({f"mm_encoder.bert_encoder.text_encoders.title.fc.{k}": v
               for k, v in title_fc.state_dict().items()})
    sd.update({f"mm_encoder.cv_encoder.image_net.{k}": v
               for k, v in vit.state_dict().items()})
    sd.update({f"com_dense.{k}": v for k, v in com_dense.state_dict().items()})
    path = str(tmp_path / "fft.pt")
    torch.save({"model_state_dict": sd}, path)

    cfg = IISANConfig(
        adapter_type="None", adding_adapter_to="None", fine_tune_to="all",
        embedding_dim=emb, word_embedding_dim=32, image_embedding_dim=32,
        text_layers=2, image_layers=2, CV_resize=16, num_words_title=6,
        compute_dtype="float32", max_seq_len=4)
    model, _ = build_uncached_model(cfg)
    ids = jnp.zeros((2, 5), jnp.int32)
    imgs = jnp.zeros((10, 16, 16, 3), jnp.uint8)
    toks = jnp.zeros((10, 12), jnp.int32)
    lm = jnp.ones((2, 4), jnp.float32)
    pop = jnp.ones((31,), jnp.float32)
    template = model.init(jax.random.PRNGKey(0), ids, imgs, toks, lm,
                          pop)["params"]

    params = params_from_reference_checkpoint(path, template)
    np.testing.assert_allclose(
        params["text_tower"]["bert"]["layer_0"]["attention"]["query"]
        ["kernel"],
        bert.state_dict()["encoder.layer.0.attention.self.query.weight"]
        .numpy().T)
    np.testing.assert_allclose(
        params["image_tower"]["classifier"]["bias"],
        vit.classifier.bias.detach().numpy())
    np.testing.assert_allclose(
        params["image_tower"]["vit"]["cls_token"],
        vit.state_dict()["vit.embeddings.cls_token"].numpy())
    np.testing.assert_allclose(
        params["text_tower"]["fc"]["kernel"],
        title_fc.weight.detach().numpy().T)
    np.testing.assert_allclose(
        params["fuse"]["com_dense"]["kernel"],
        com_dense.weight.detach().numpy().T)

    # patched-tower checkpoints are rejected loudly
    sd_lora = dict(sd)
    sd_lora["mm_encoder.bert_encoder.text_encoders.title.bert_model."
            "encoder.layer.0.attention.self.query.lora_A"] = \
        torch.zeros(4, 32)
    lora_path = str(tmp_path / "lora.pt")
    torch.save({"model_state_dict": sd_lora}, lora_path)
    with pytest.raises(ImportError_, match="LoRA/Houlsby"):
        params_from_reference_checkpoint(lora_path)


def test_uncached_iisan_checkpoint_rejected(ref_modules, tmp_path):
    """Uncached-IISAN layout (towers registered directly on the adapted
    model NEXT TO the adapter lists, Code_Uncached/model/model.py:169-170)
    must be rejected — not silently routed to the FFT path, which would
    import towers and leave the trained side network random."""
    from transformers import BertConfig, BertModel

    _, ref_encoders = ref_modules
    torch.manual_seed(5)
    ue = ref_encoders.User_Encoder(item_num=30, max_seq_len=4, item_dim=16,
                                   num_attention_heads=2, dropout=0.0,
                                   n_layers=2)
    bert = BertModel(BertConfig(
        hidden_size=32, num_hidden_layers=1, num_attention_heads=2,
        intermediate_size=128, vocab_size=64, max_position_embeddings=32))
    adapter = torch.nn.Linear(32, 8)
    sd = {f"user_encoder.{k}": v for k, v in ue.state_dict().items()}
    sd.update({f"mm_encoder.bert_encoder.text_encoders.title.bert_model.{k}":
               v for k, v in bert.state_dict().items()})
    sd["mm_encoder.bert_adapter_list.0.fc_down.weight"] = adapter.weight
    sd["mm_encoder.bert_adapter_list.0.fc_down.bias"] = adapter.bias
    path = str(tmp_path / "unc_iisan.pt")
    torch.save({"model_state_dict": sd}, path)
    with pytest.raises(ImportError_, match="uncached-IISAN"):
        params_from_reference_checkpoint(path)


def test_reference_export_roundtrip(ref_modules, tmp_path):
    """reference_state_dict_from_params is the exact inverse of the
    import, AND the reference's own modules load it with strict=True —
    a model trained here runs under the reference's tooling."""
    from iisan_tpu.utils.torch_import import reference_state_dict_from_params

    ref_model, ref_encoders = ref_modules
    args = ref_args()
    model, template, cfg = our_model(args)

    sd = reference_state_dict_from_params(template)
    back = params_from_reference_checkpoint({"model_state_dict": sd},
                                            template)

    flat_a = jax.tree_util.tree_leaves_with_path(template)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back))
    assert len(flat_a) == len(flat_b)
    for kp, leaf in flat_a:
        np.testing.assert_allclose(np.asarray(leaf), flat_b[kp], atol=1e-7,
                                   err_msg=str(kp))

    # strict load into the reference's own modules: proves the exported
    # key set is exactly what the reference expects
    san_torch, ue_torch, com_torch = build_reference_checkpoint(
        ref_model, ref_encoders, args, str(tmp_path / "scratch.pt"))
    san_sd = {k[len("mm_encoder."):]: v for k, v in sd.items()
              if k.startswith("mm_encoder.")}
    san_torch.load_state_dict(san_sd, strict=True)
    ue_sd = {k[len("user_encoder."):]: v for k, v in sd.items()
             if k.startswith("user_encoder.")}
    ue_torch.load_state_dict(ue_sd, strict=True)
    com_sd = {k[len("com_dense."):]: v for k, v in sd.items()
              if k.startswith("com_dense.")}
    com_torch.load_state_dict(com_sd, strict=True)


def test_id_checkpoint_with_registered_com_dense(ref_modules, tmp_path):
    """ModelMM registers com_dense even in ID mode (where it is
    unreachable, run.py:377 dead path); the importer must drop it rather
    than fail the merge, and the exporter must synthesize it so the
    reference's strict load_state_dict succeeds."""
    from iisan_tpu.utils.torch_import import reference_state_dict_from_params

    _, ref_encoders = ref_modules
    torch.manual_seed(6)
    ue = ref_encoders.User_Encoder(item_num=50, max_seq_len=4, item_dim=16,
                                   num_attention_heads=2, dropout=0.0,
                                   n_layers=2)
    id_emb = torch.nn.Embedding(51, 16, padding_idx=0)
    com = torch.nn.Linear(32, 16)
    sd = {f"user_encoder.{k}": v for k, v in ue.state_dict().items()}
    sd["id_embedding.weight"] = id_emb.weight.detach()
    sd.update({f"com_dense.{k}": v for k, v in com.state_dict().items()})
    path = str(tmp_path / "id_cd.pt")
    torch.save({"model_state_dict": sd}, path)

    out = params_from_reference_checkpoint(path)
    assert "fuse" not in out                    # dropped, not crashed
    np.testing.assert_allclose(out["id_embedding"]["embedding"],
                               id_emb.weight.detach().numpy())

    # and use it as its own merge template (id trainer tree shape)
    merged = params_from_reference_checkpoint(path, out)
    assert "id_embedding" in merged

    # export synthesizes com_dense so strict reference load works
    back_sd = reference_state_dict_from_params(out)
    assert back_sd["com_dense.weight"].shape == (16, 32)
    assert "id_embedding.weight" in back_sd
