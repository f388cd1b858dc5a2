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


def trainable_mask(params, method: str) -> Any:
    method = method.lower()

    def pred(kp, _):
        path = _path_str(kp)
        if method in ("fft", "all", "none"):
            return True
        if _is_head(path):
            return True
        if method == "iisan":
            return False  # towers fully frozen beyond the heads
        if method == "lora":
            return "lora_A" in path or "lora_B" in path
        if method in ("houslby", "houlsby", "adapter"):
            return "attention_adapter" in path or "output_adapter" in path
        if method == "bitfit":
            return path.endswith("bias/")
        raise ValueError(f"unknown PEFT method {method}")

    return jax.tree_util.tree_map_with_path(pred, params)
