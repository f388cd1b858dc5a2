"""Flax CLIP-style vision encoder with per-layer hidden-state taps.

TPU-native replacement for the CLIP-family vision tower IISAN-Versa's EVA
cache builder runs frozen (``cv_model.vision_model(pixel_values=...,
output_hidden_states=True)``,
/root/reference/Code_Cached_Asym/process_eva_clip_vectors.py:86-96), taking
each hidden state's first token (CLS) per item into ``[layers+1, dim]``
tensors (49 x 5120 for EVA-CLIP-18B).

HF ``CLIPVisionModel`` semantics reproduced exactly:
  * class embedding prepended to a bias-free conv patch embedding, learned
    absolute position embeddings, then a pre-encoder LayerNorm
    (``pre_layrnorm`` - HF's typo preserved only in the importer mapping);
  * pre-LN blocks: x + attn(LN1(x)), x + mlp(LN2(x));
  * MLP with quick_gelu (x * sigmoid(1.702x)) by default, configurable to
    gelu for OpenCLIP-style checkpoints;
  * hidden_states layout: entry 0 is the post-pre-LN embedding output,
    entries 1..L are raw block outputs (the final ``post_layernorm`` is
    applied only to the pooled CLS, never to hidden_states).

Geometry is fully parameterizable: EVA-CLIP-18B's vision tower (48 layers,
width 5120) and the small CLIP ViTs are the same module at different sizes.
EVA-18B itself ships as trust-remote-code with architecture deltas; caches
produced by it remain importable via the reference-.pt import path
(data/cache_store.py), while this module makes CLIP-family cache *builds*
possible in-framework.

Like the Llama tower, the block stack is one ``nn.scan`` over stacked
per-layer weights: depth-independent compile time, scan-pipelined on TPU.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def quick_gelu(x):
    return x * nn.sigmoid(1.702 * x)


class CLIPBlock(nn.Module):
    num_heads: int
    intermediate_dim: int
    hidden_act: str = "quick_gelu"
    ln_eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        dh = d // self.num_heads
        b, t = x.shape[0], x.shape[1]
        h = nn.LayerNorm(epsilon=self.ln_eps, dtype=jnp.float32,
                         name="layer_norm1")(
            x.astype(jnp.float32)).astype(self.dtype)

        def proj(name):
            y = nn.Dense(d, dtype=self.dtype, name=name)(h)
            return y.reshape(b, t, self.num_heads, dh).transpose(0, 2, 1, 3)

        q, k, v = proj("q_proj"), proj("k_proj"), proj("v_proj")
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) / math.sqrt(dh)
        p = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v,
                       preferred_element_type=jnp.float32).astype(self.dtype)
        o = o.transpose(0, 2, 1, 3).reshape(b, t, d)
        x = x + nn.Dense(d, dtype=self.dtype, name="out_proj")(o)

        h = nn.LayerNorm(epsilon=self.ln_eps, dtype=jnp.float32,
                         name="layer_norm2")(
            x.astype(jnp.float32)).astype(self.dtype)
        h = nn.Dense(self.intermediate_dim, dtype=self.dtype, name="fc1")(h)
        h = quick_gelu(h) if self.hidden_act == "quick_gelu" \
            else nn.gelu(h, approximate=False)
        h = nn.Dense(d, dtype=self.dtype, name="fc2")(h)
        return x + h


class _ScannedBlock(nn.Module):
    num_heads: int
    intermediate_dim: int
    hidden_act: str
    ln_eps: float
    dtype: Any

    @nn.compact
    def __call__(self, x):
        x = CLIPBlock(self.num_heads, self.intermediate_dim, self.hidden_act,
                      self.ln_eps, self.dtype, name="block")(x)
        return x, x


class CLIPVisionEncoder(nn.Module):
    """Returns (pooled_cls, all_hidden).

    Input images: (B, H, W, 3) channels-last, CLIP-normalized by the host
    pipeline.  all_hidden: (num_layers+1, B, T, D) in HF hidden_states
    order.  pooled_cls is post_layernorm(last[:, 0]) - HF's pooler_output.
    """

    image_size: int = 224
    patch_size: int = 14
    hidden_dim: int = 5120
    num_layers: int = 48
    num_heads: int = 40
    intermediate_dim: int = 20480
    hidden_act: str = "quick_gelu"
    ln_eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images, deterministic: bool = True):
        b = images.shape[0]
        p = self.patch_size
        n = self.image_size // p
        # Patchify as reshape+matmul (MXU-direct; CLIP's patch conv is
        # bias-free).
        x = images.astype(self.dtype).reshape(b, n, p, n, p, 3)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, n * n, p * p * 3)
        x = nn.Dense(self.hidden_dim, use_bias=False, dtype=self.dtype,
                     name="patch_projection")(x)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (self.hidden_dim,))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype),
                              (b, 1, self.hidden_dim)), x], axis=1)
        pos = self.param("position_embeddings", nn.initializers.normal(0.02),
                         (n * n + 1, self.hidden_dim))
        x = x + pos[None].astype(self.dtype)
        x = nn.LayerNorm(epsilon=self.ln_eps, dtype=jnp.float32,
                         name="pre_layernorm")(
            x.astype(jnp.float32)).astype(self.dtype)

        scan = nn.scan(
            _ScannedBlock,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            out_axes=0,
            length=self.num_layers,
        )
        last, ys = scan(self.num_heads, self.intermediate_dim,
                        self.hidden_act, self.ln_eps, self.dtype,
                        name="layers")(x)
        hiddens = jnp.concatenate([x[None], ys], axis=0)
        pooled = nn.LayerNorm(epsilon=self.ln_eps, dtype=jnp.float32,
                              name="post_layernorm")(
            last[:, 0].astype(jnp.float32)).astype(self.dtype)
        return pooled, hiddens


def params_from_hf_torch(state_dict, num_layers: int,
                         prefix: str = "vision_model."):
    """Map a transformers CLIPVisionModel state_dict onto CLIPVisionEncoder
    params (per-layer tensors stacked for the scan layout)."""

    def t(name):
        return np.asarray(state_dict[prefix + name].detach().float()
                          .cpu().numpy())

    def stack_lin(field):
        return {
            "kernel": np.stack(
                [t(f"encoder.layers.{i}.{field}.weight").T
                 for i in range(num_layers)]),
            "bias": np.stack(
                [t(f"encoder.layers.{i}.{field}.bias")
                 for i in range(num_layers)]),
        }

    def stack_ln(field):
        return {
            "scale": np.stack(
                [t(f"encoder.layers.{i}.{field}.weight")
                 for i in range(num_layers)]),
            "bias": np.stack(
                [t(f"encoder.layers.{i}.{field}.bias")
                 for i in range(num_layers)]),
        }

    def ln(name):
        return {"scale": t(name + ".weight"), "bias": t(name + ".bias")}

    conv_w = t("embeddings.patch_embedding.weight")  # (D, 3, p, p), no bias
    d, c, p1, p2 = conv_w.shape
    kernel = conv_w.transpose(2, 3, 1, 0).reshape(p1 * p2 * c, d)
    p = {
        "patch_projection": {"kernel": kernel},
        "class_embedding": t("embeddings.class_embedding"),
        "position_embeddings": t("embeddings.position_embedding.weight"),
        "pre_layernorm": ln("pre_layrnorm"),  # HF's attribute typo
        "post_layernorm": ln("post_layernorm"),
        "layers": {"block": {
            "layer_norm1": stack_ln("layer_norm1"),
            "layer_norm2": stack_ln("layer_norm2"),
            "q_proj": stack_lin("self_attn.q_proj"),
            "k_proj": stack_lin("self_attn.k_proj"),
            "v_proj": stack_lin("self_attn.v_proj"),
            "out_proj": stack_lin("self_attn.out_proj"),
            "fc1": stack_lin("mlp.fc1"),
            "fc2": stack_lin("mlp.fc2"),
        }},
    }
    return jax.tree_util.tree_map(jnp.asarray, p)


def encoder_from_hf_config(cfg, dtype=jnp.float32) -> CLIPVisionEncoder:
    """Build at the geometry a transformers CLIPVisionConfig names."""
    return CLIPVisionEncoder(
        image_size=cfg.image_size,
        patch_size=cfg.patch_size,
        hidden_dim=cfg.hidden_size,
        num_layers=cfg.num_hidden_layers,
        num_heads=cfg.num_attention_heads,
        intermediate_dim=cfg.intermediate_size,
        hidden_act=getattr(cfg, "hidden_act", "quick_gelu"),
        ln_eps=getattr(cfg, "layer_norm_eps", 1e-5),
        dtype=dtype,
    )
