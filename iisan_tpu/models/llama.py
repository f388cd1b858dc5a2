"""Flax Llama-architecture text encoder with per-layer hidden-state taps.

TPU-native replacement for the ``LlamaForCausalLM`` tower the reference's
IISAN-Versa cache builders run frozen over the item catalog
(/root/reference/Code_Cached_Asym/preprocess_llama-3-70b_micro.py:83-90),
stacking the MEAN of each layer's token embeddings per item (:67-70) into
``[layers+1, dim]`` tensors (81 x 8192 for Llama-3-70B).

Architecture (HF ``LlamaModel`` semantics):
  * RMSNorm (fp32 variance, cast back) pre-attention and pre-MLP;
  * rotary position embeddings on q/k (default rope, configurable theta);
  * grouped-query attention (num_kv_heads <= num_heads, heads repeated);
  * SwiGLU MLP (down(silu(gate(x)) * up(x))), no biases anywhere;
  * hidden_states tuple layout reproduced exactly: entry 0 is the token
    embedding, entries 1..L-1 are raw decoder-layer outputs, and the LAST
    entry is the final-RMSNorm'd output (HF appends post-norm) - the cache
    rows the reference mean-pools are exactly these.

TPU-first: the decoder stack is a single ``nn.scan`` over stacked per-layer
weights - one compiled layer body regardless of depth, so an 80-layer tower
compiles as fast as a 2-layer one and XLA pipelines the scan steps.  The
weight importer stacks the HF per-layer tensors along a leading axis to
match.

Reference-builder quirk preserved by the callers: the Llama builders pass NO
attention mask (manual 0-padding, preprocess_llama-3-70b_micro.py:33-42,60),
so pads are attended and the per-layer mean runs over all positions; pass an
all-ones mask to reproduce that, or a real mask for the corrected variant.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class RMSNorm(nn.Module):
    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        xf = xf * jax.lax.rsqrt(var + self.eps)
        return (xf * scale.astype(jnp.float32)).astype(self.dtype)


def rotary_tables(t: int, head_dim: int, theta: float):
    """(T, head_dim) cos/sin tables, HF LlamaRotaryEmbedding default rope."""
    inv_freq = 1.0 / (theta ** (np.arange(0, head_dim, 2,
                                          dtype=np.float32) / head_dim))
    freqs = np.outer(np.arange(t, dtype=np.float32), inv_freq)  # (T, dh/2)
    emb = np.concatenate([freqs, freqs], axis=-1)
    return jnp.asarray(np.cos(emb)), jnp.asarray(np.sin(emb))


def _rotate_half(x):
    h = x.shape[-1] // 2
    return jnp.concatenate([-x[..., h:], x[..., :h]], axis=-1)


def apply_rotary(q, k, cos, sin):
    """q/k: (B, H, T, dh); cos/sin: (T, dh)."""
    cos = cos[None, None, :, :].astype(q.dtype)
    sin = sin[None, None, :, :].astype(q.dtype)
    return q * cos + _rotate_half(q) * sin, k * cos + _rotate_half(k) * sin


class LlamaLayer(nn.Module):
    num_heads: int
    num_kv_heads: int
    intermediate_dim: int
    rms_eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, bias, cos, sin):
        d = x.shape[-1]
        dh = d // self.num_heads
        b, t = x.shape[0], x.shape[1]
        h = RMSNorm(self.rms_eps, self.dtype, name="input_layernorm")(x)

        def proj(name, n_h):
            y = nn.Dense(n_h * dh, use_bias=False, dtype=self.dtype,
                         name=name)(h)
            return y.reshape(b, t, n_h, dh).transpose(0, 2, 1, 3)

        q = proj("q_proj", self.num_heads)
        k = proj("k_proj", self.num_kv_heads)
        v = proj("v_proj", self.num_kv_heads)
        q, k = apply_rotary(q, k, cos, sin)
        if self.num_kv_heads != self.num_heads:
            rep = self.num_heads // self.num_kv_heads
            k = jnp.repeat(k, rep, axis=1)
            v = jnp.repeat(v, rep, axis=1)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits / math.sqrt(dh) + bias
        p = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v,
                       preferred_element_type=jnp.float32).astype(self.dtype)
        o = o.transpose(0, 2, 1, 3).reshape(b, t, d)
        x = x + nn.Dense(d, use_bias=False, dtype=self.dtype, name="o_proj")(o)

        h = RMSNorm(self.rms_eps, self.dtype, name="post_attention_layernorm")(x)
        gate = nn.Dense(self.intermediate_dim, use_bias=False,
                        dtype=self.dtype, name="gate_proj")(h)
        up = nn.Dense(self.intermediate_dim, use_bias=False,
                      dtype=self.dtype, name="up_proj")(h)
        h = nn.Dense(d, use_bias=False, dtype=self.dtype,
                     name="down_proj")(nn.silu(gate) * up)
        return x + h


class _ScannedLayer(nn.Module):
    """Scan-body wrapper: carry = hidden states, y = layer output."""

    num_heads: int
    num_kv_heads: int
    intermediate_dim: int
    rms_eps: float
    dtype: Any

    @nn.compact
    def __call__(self, x, bias, cos, sin):
        x = LlamaLayer(self.num_heads, self.num_kv_heads,
                       self.intermediate_dim, self.rms_eps, self.dtype,
                       name="block")(x, bias, cos, sin)
        return x, x


class LlamaEncoder(nn.Module):
    """Decoder-only transformer; returns (last_normed, all_hidden).

    all_hidden: (num_layers+1, B, T, D) in the HF hidden_states layout
    described in the module docstring (last entry final-norm'd).
    """

    vocab_size: int = 128256
    hidden_dim: int = 8192
    num_layers: int = 80
    num_heads: int = 64
    num_kv_heads: int = 8
    intermediate_dim: int = 28672
    rope_theta: float = 500000.0  # Llama-3; Llama-2 uses 10000
    rms_eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask, deterministic: bool = True):
        b, t = input_ids.shape
        x = nn.Embed(self.vocab_size, self.hidden_dim, dtype=self.dtype,
                     name="embed_tokens")(input_ids)
        dh = self.hidden_dim // self.num_heads
        cos, sin = rotary_tables(t, dh, self.rope_theta)
        causal = jnp.triu(jnp.full((t, t), -1e9, jnp.float32), k=1)
        pad = (1.0 - attention_mask.astype(jnp.float32))[:, None, None, :] * -1e9
        bias = causal[None, None, :, :] + pad

        scan = nn.scan(
            _ScannedLayer,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=(nn.broadcast, nn.broadcast, nn.broadcast),
            out_axes=0,
            length=self.num_layers,
        )
        last, ys = scan(self.num_heads, self.num_kv_heads,
                        self.intermediate_dim, self.rms_eps, self.dtype,
                        name="layers")(x, bias, cos, sin)
        last_normed = RMSNorm(self.rms_eps, self.dtype, name="norm")(last)
        # HF hidden_states: embed, out_1..out_{L-1}, norm(out_L).
        hiddens = jnp.concatenate(
            [x[None], ys[:-1], last_normed[None]], axis=0)
        return last_normed, hiddens


def params_from_hf_torch(state_dict, num_layers: int,
                         prefix: str = "model."):
    """Map a transformers LlamaModel/LlamaForCausalLM state_dict onto
    LlamaEncoder params, stacking per-layer tensors along a leading axis to
    match the ``nn.scan`` layout."""

    def t(name):
        return np.asarray(state_dict[prefix + name].detach().float()
                          .cpu().numpy())

    def stack_lin(field):
        # torch Linear weight (out, in) -> flax kernel (in, out), stacked (L,...)
        return {"kernel": np.stack(
            [t(f"layers.{i}.{field}.weight").T for i in range(num_layers)])}

    def stack_norm(field):
        return {"scale": np.stack(
            [t(f"layers.{i}.{field}.weight") for i in range(num_layers)])}

    p = {
        "embed_tokens": {"embedding": t("embed_tokens.weight")},
        "norm": {"scale": t("norm.weight")},
        "layers": {"block": {
            "input_layernorm": stack_norm("input_layernorm"),
            "post_attention_layernorm": stack_norm("post_attention_layernorm"),
            "q_proj": stack_lin("self_attn.q_proj"),
            "k_proj": stack_lin("self_attn.k_proj"),
            "v_proj": stack_lin("self_attn.v_proj"),
            "o_proj": stack_lin("self_attn.o_proj"),
            "gate_proj": stack_lin("mlp.gate_proj"),
            "up_proj": stack_lin("mlp.up_proj"),
            "down_proj": stack_lin("mlp.down_proj"),
        }},
    }
    return jax.tree_util.tree_map(jnp.asarray, p)


def encoder_from_hf_config(cfg, dtype=jnp.float32) -> LlamaEncoder:
    """Build at the geometry a transformers LlamaConfig names."""
    return LlamaEncoder(
        vocab_size=cfg.vocab_size,
        hidden_dim=cfg.hidden_size,
        num_layers=cfg.num_hidden_layers,
        num_heads=cfg.num_attention_heads,
        num_kv_heads=getattr(cfg, "num_key_value_heads",
                             cfg.num_attention_heads),
        intermediate_dim=cfg.intermediate_size,
        rope_theta=getattr(cfg, "rope_theta", 10000.0),
        rms_eps=getattr(cfg, "rms_norm_eps", 1e-5),
        dtype=dtype,
    )
