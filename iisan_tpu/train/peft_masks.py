"""Trainability masks for the PEFT method registry.

The reference freezes everything (``fine_tune_to='None'``,
/root/reference/Code_Uncached/run.py:176-181) and then re-enables
parameters by name-substring per method (run.py:186-260).  Here each method
is a path-predicate producing a boolean pytree consumed by
``build_optimizer(..., trainable_mask=...)`` - the functional analog of
requires_grad.

Method registry (SURVEY.md section 2.1 #7):
  fft      - everything trains (adding_adapter_to='None', fine_tune_to='all')
  iisan    - SAN + user encoder + fuse + tower output heads (fc/classifier)
  lora     - LoRA A/B factors + user + heads + fuse (towers frozen)
  houslby  - Houlsby adapters + user + heads + fuse
  bitfit   - tower biases + user + heads + fuse
"""

from __future__ import annotations

import re
from typing import Any

import jax

_HEAD_MARKERS = ("user_encoder", "fuse", "san")
# tower output heads re-enabled by every PEFT method (run.py:178-180:
# "classifier", "title.fc")
_TOWER_HEADS = ("image_tower/classifier", "text_tower/fc/")


def _path_str(kp) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in kp) + "/"


def _is_head(path: str) -> bool:
    if any(m in path for m in _HEAD_MARKERS):
        return True
    return any(h in path for h in _TOWER_HEADS)


# ---------------------------------------------------------------------------
# torch named_parameters() enumeration order for the HF towers, used to
# reproduce --freeze_paras_before (an index-based freeze,
# Code_Uncached/run.py:55,66,99).  Index tables derived from the HF module
# definition order; the reference's own hard-coded pooler indices for
# bert-base ([197, 198], run.py:92) confirm the BERT count (5 + 12*16).

_BERT_EMB = {"word_embeddings/embedding": 0, "position_embeddings": 1,
             "token_type_embeddings": 2, "embeddings_layernorm/scale": 3,
             "embeddings_layernorm/bias": 4}
_BERT_LAYER = {"attention/query/kernel": 0, "attention/query/bias": 1,
               "attention/key/kernel": 2, "attention/key/bias": 3,
               "attention/value/kernel": 4, "attention/value/bias": 5,
               "attention_output/kernel": 6, "attention_output/bias": 7,
               "attention_layernorm/scale": 8, "attention_layernorm/bias": 9,
               "intermediate/kernel": 10, "intermediate/bias": 11,
               "output/kernel": 12, "output/bias": 13,
               "output_layernorm/scale": 14, "output_layernorm/bias": 15}
_VIT_EMB = {"cls_token": 0, "position_embeddings": 1,
            "patch_projection/kernel": 2, "patch_projection/bias": 3}
_VIT_LAYER = {"attention/query/kernel": 0, "attention/query/bias": 1,
              "attention/key/kernel": 2, "attention/key/bias": 3,
              "attention/value/kernel": 4, "attention/value/bias": 5,
              "attention_output/kernel": 6, "attention_output/bias": 7,
              "intermediate/kernel": 8, "intermediate/bias": 9,
              "output/kernel": 10, "output/bias": 11,
              "layernorm_before/scale": 12, "layernorm_before/bias": 13,
              "layernorm_after/scale": 14, "layernorm_after/bias": 15}
_VIT_FINAL = {"final_layernorm/scale": 0, "final_layernorm/bias": 1}


def torch_param_index(path: str) -> int:
    """torch named_parameters() index of a tower parameter, or -1 for
    non-tower / post-tower (new head, adapter) parameters."""
    if "/bert/" in path:
        rel, emb, per_layer, final = (path.split("/bert/", 1)[1],
                                      _BERT_EMB, _BERT_LAYER, {})
    elif "/vit/" in path:
        rel, emb, per_layer, final = (path.split("/vit/", 1)[1],
                                      _VIT_EMB, _VIT_LAYER, _VIT_FINAL)
    else:
        return -1
    rel = rel.rstrip("/")
    if rel in emb:
        return emb[rel]
    m = re.match(r"layer_(\d+)/(.*)", rel)
    if m and m.group(2) in per_layer:
        return len(emb) + 16 * int(m.group(1)) + per_layer[m.group(2)]
    if rel in final:
        # After all layers; the caller needs the layer count, so encode as
        # a large offset resolved lazily: final-LN indices follow the last
        # layer.  Use a sentinel the mask resolves with the max layer seen.
        return -2 - final[rel]
    return -1


def _is_tower_layernorm(path: str) -> bool:
    """Tower LayerNorm params (the reference's name test
    run.py:283-284: LayerNorm/layer_norm/layernorm, excluding adapters)."""
    if "adapter" in path or "lora" in path:
        return False
    if "/bert/" not in path and "/vit/" not in path:
        return False
    return "layernorm" in path.lower()


def trainable_mask(params, method: str, *, finetune_layernorm: bool = False,
                   freeze_paras_before: int = 0,
                   fine_tune_to_all: bool = False) -> Any:
    """Boolean pytree of trainability.

    Precedence mirrors the reference's mutation order: the per-tower
    index freeze at load time (run.py:55,99) < the fine_tune_to branch
    ('all' keeps the load-time state, 'None' freezes everything,
    run.py:176-183) < the method's re-enables (run.py:186-260) < the
    final finetune_layernorm re-enable (run.py:281-285).  With
    ``fine_tune_to_all`` a PEFT method therefore trains the towers TOO
    (minus the index freeze) - the reference's `'all' -> pass` branch -
    while the default 'None' freezes everything the method does not
    re-enable.
    """
    method = method.lower()
    # Resolve the ViT final-LN sentinel: its torch index follows the last
    # encoder layer (4 + 16 * num_layers + {0, 1}).  Only the index-freeze
    # paths consult it, so skip the full-tree scan otherwise.
    max_vit_layer = -1
    if freeze_paras_before > 0:
        for kp, _ in jax.tree_util.tree_leaves_with_path(params):
            p = _path_str(kp)
            if "/vit/" in p and "layer_" in p:
                m = re.search(r"layer_(\d+)/", p)
                if m:
                    max_vit_layer = max(max_vit_layer, int(m.group(1)))

    def resolved_index(path: str) -> int:
        idx = torch_param_index(path)
        if idx <= -2:  # ViT final-LN sentinel
            return len(_VIT_EMB) + 16 * (max_vit_layer + 1) + (-2 - idx)
        return idx

    def index_frozen(path: str) -> bool:
        if freeze_paras_before <= 0:
            return False
        idx = resolved_index(path)
        return 0 <= idx < freeze_paras_before

    def pred(kp, _):
        path = _path_str(kp)
        if method in ("fft", "all", "none"):
            base = not index_frozen(path)
        elif _is_head(path):
            base = True
        elif method == "iisan":
            base = False  # towers fully frozen beyond the heads
        elif method == "lora":
            base = "lora_A" in path or "lora_B" in path
        elif method in ("houslby", "houlsby", "adapter"):
            base = "attention_adapter" in path or "output_adapter" in path
        elif method == "bitfit":
            base = path.endswith("bias/")
        else:
            raise ValueError(f"unknown PEFT method {method}")
        if not base and fine_tune_to_all:
            # fine_tune_to='all': params the method did not re-enable keep
            # their load-time trainability (run.py:177-178 `pass`), i.e.
            # trainable unless index-frozen at load.
            base = not index_frozen(path)
        if finetune_layernorm and _is_tower_layernorm(path):
            base = True
        return base

    return jax.tree_util.tree_map_with_path(pred, params)
