"""Role-based multi-learning-rate optimizer.

The reference builds a 5-group Adam by substring-matching parameter *names*
(/root/reference/Code_Cached/run.py:260-307): text tower, image tower,
recsys, cv-adapters, text-adapters.  Here the same assignment is made from
the structured parameter tree path - a principled labeling that reproduces
the reference's effective mapping (including its quirks, e.g. the cv-side
gate scalars landing in the *image-tower* lr group because their name
contains "cv" but not "adapter", run.py:269-276, and the inter-modal
``mm_adapter`` stack landing in the cv-adapter group, run.py:286-287).

Label table for the cached IISAN model (derived from run.py:267-292):

  path contains                      group           lr flag
  ---------------------------------  --------------  -------------------
  san/bert_adapter_list_*            adapter_text    --adapter_bert_lr
  san/cv_adapter_list_*              adapter_cv      --adapter_cv_lr
  san/mm_adapter_list_*              adapter_cv      --adapter_cv_lr
  san/side_gate_params_cv            image_tower     --fine_tune_lr_image
  san/side_gate_params_text|mm       recsys          --lr
  san/fc_bert                        text_tower      --fine_tune_lr_text
  san/fc_cv                          image_tower     --fine_tune_lr_image
  san/fc_mm, san/fc_mm_down          recsys          --lr
  san/cv_pre_fc, san/bert_pre_fc     recsys          --lr
  san/down_project_list_*            recsys          --lr
  user_encoder/*, fuse/*             recsys          --lr
  text_tower/bert/*                  text_tower      --fine_tune_lr_text
  text_tower/bert/*lora_|adapter*    adapter_text    --adapter_bert_lr
  text_tower/fc/*  (title fc head)   recsys          --lr
  image_tower/vit/*                  image_tower     --fine_tune_lr_image
  image_tower/vit/*lora_|adapter*    adapter_cv      --adapter_cv_lr
  image_tower/classifier/*           recsys          --lr
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import optax

GROUPS = ("text_tower", "image_tower", "recsys", "adapter_cv", "adapter_text")


def label_for_path(path: str) -> str:
    """Map a '/'-joined parameter path to its optimizer group."""
    if "bert_adapter_list" in path:
        return "adapter_text"
    if "cv_adapter_list" in path or "mm_adapter_list" in path:
        return "adapter_cv"
    if "side_gate_params_cv" in path:
        return "image_tower"
    if "side_gate_params" in path:
        return "recsys"
    if "fc_bert" in path:
        return "text_tower"
    if "fc_cv" in path:
        return "image_tower"
    # Uncached tower params (FFT/LoRA/Houlsby/BitFit; run.py:296-316):
    # tower weights at the fine-tune lrs, in-tower adapters/LoRA at the
    # adapter lrs, the replaced heads (title fc / ViT classifier) in the
    # recsys group like the reference's 'fc'-without-'fc_' rule.
    if path.startswith("text_tower/"):
        if path.startswith("text_tower/fc/"):
            return "recsys"
        if "lora_" in path or "adapter" in path:
            return "adapter_text"
        return "text_tower"
    if path.startswith("image_tower/"):
        if path.startswith("image_tower/classifier/"):
            return "recsys"
        if "lora_" in path or "adapter" in path:
            return "adapter_cv"
        return "image_tower"
    return "recsys"


def param_labels(params) -> Any:
    flat = jax.tree_util.tree_map_with_path(
        lambda kp, _: label_for_path(
            "/".join(str(getattr(k, "key", k)) for k in kp)
        ),
        params,
    )
    return flat


def log_group_sizes(cfg, params, trainable_mask=None) -> Dict[str, int]:
    """Per-group parameter-tensor counts - the reference's
    '***** N parameters have learning rate LR *****' lines
    (run.py:320-322)."""
    import logging

    log = logging.getLogger("iisan_tpu")
    labels = jax.tree_util.tree_leaves(param_labels(params))
    masks = jax.tree_util.tree_leaves(trainable_mask) if trainable_mask \
        else [True] * len(labels)
    lrs = {"text_tower": cfg.fine_tune_lr_text,
           "image_tower": cfg.fine_tune_lr_image,
           "recsys": cfg.lr,
           "adapter_cv": cfg.adapter_cv_lr,
           "adapter_text": cfg.adapter_bert_lr}
    counts = {g: 0 for g in GROUPS}
    for lab, m in zip(labels, masks):
        if m:
            counts[lab] += 1
    for g, n in counts.items():
        if n:
            log.info("***** %d parameters have learning rate %g *****",
                     n, lrs[g])
    return counts


def build_optimizer(cfg, params, trainable_mask=None) -> optax.GradientTransformation:
    """5-group Adam (torch defaults b1=.9 b2=.999 eps=1e-8, run.py:301-307).

    ``trainable_mask``: optional pytree of bools - False params get
    ``set_to_zero`` updates, the analog of requires_grad=False freezing
    (run.py:154-160).  The Adam itself is masked to the TRAINABLE leaves:
    frozen params carry no m/v state (torch creates optimizer state
    lazily, so its frozen params never get any either) and no Adam math.
    Before this masking the frozen towers' 200M-param zero-grad Adam was
    ~1.6 GB of dead m/v state plus several full-HBM passes per step; with
    it, the frozen updates are compile-time zeros, so XLA folds the
    params passthrough AND dead-code-eliminates the tower backward.
    """
    lrs: Dict[str, float] = {
        "text_tower": cfg.fine_tune_lr_text,
        "image_tower": cfg.fine_tune_lr_image,
        "recsys": cfg.lr,
        "adapter_cv": cfg.adapter_cv_lr,
        "adapter_text": cfg.adapter_bert_lr,
    }
    transforms = {g: optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
                  for g, lr in lrs.items()}
    tx = optax.multi_transform(transforms, param_labels(params))
    if trainable_mask is not None:
        tx = optax.chain(
            # zero the frozen grads first (masked() would otherwise pass
            # them through as updates) ...
            optax.masked(optax.set_to_zero(),
                         jax.tree_util.tree_map(lambda b: not b, trainable_mask)),
            # ... then run Adam on the trainable leaves only
            optax.masked(tx, trainable_mask),
        )
    return tx
