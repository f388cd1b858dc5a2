"""Fused multi-head self-attention Pallas kernel for the encoder towers.

Why: the uncached IISAN step runs the frozen ViT-base tower in-graph over
352 images x 197 tokens.  XLA's lowering of per-head attention
materializes the (B, H, T, T) score tensor in HBM - 656 MB in fp32 at this
geometry - plus the head split/merge transposes, costing ~58 ms of the
~190 ms step (measured by trace attribution; the *matmul* FLOPs of
attention are ~3% of the step).  This kernel keeps scores entirely in
VMEM: each grid program loads a block of images' Q/K/V (straight from the
projection, no head transpose), loops the heads as lane slices, and runs
QK^T -> softmax -> PV as Mosaic batched matmuls.

Scope: encoder self-attention without mask and without attention dropout -
exactly the ViT tower configuration (ViT has no padding mask and HF
ViT-base has attention dropout 0.0).  An optional additive key bias
(B, T) covers BERT's padding mask; attention dropout is not supported (the
caller falls back to the module path when it needs it).

Backward: a ``jax.custom_vjp`` whose bwd recomputes attention with plain
XLA einsums and differentiates those - the IISAN uncached path
stop-gradients at the tap boundary so the bwd never runs there, and
methods that do train the towers (FFT/LoRA/...) keep the XLA path
entirely (see models/vit.py gating).

Reference for semantics: /root/reference/Code_Uncached/model/encoders.py
runs HF towers; this matches our models/vit.py ViTSelfAttention math
(bf16 QK/PV matmuls, fp32-stable softmax).
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Images (batch rows) per grid program.  2 keeps Q/K/V blocks (double-
# buffered), per-head fp32 scores, and the head-output accumulator inside
# the 16 MB VMEM budget at ViT-base geometry (4 needs ~17 MB).
BATCH_BLOCK = 2


def _bmm(a, b, contract):
    return jax.lax.dot_general(a, b, ((contract), ((0,), (0,))),
                               preferred_element_type=jnp.float32)


def _mha_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, H, T, D, dt,
                with_bias):
    dk = D // H
    inv = 1.0 / math.sqrt(dk)
    q = q_ref[...]  # (Bb, T, D) dt
    k = k_ref[...]
    v = v_ref[...]
    if with_bias:
        bias = bias_ref[...][:, 0, :].astype(jnp.float32)  # (Bb, T) key bias
    outs = []
    for h in range(H):
        sl = slice(h * dk, (h + 1) * dk)
        qh, kh, vh = q[:, :, sl], k[:, :, sl], v[:, :, sl]
        s = _bmm(qh.astype(jnp.float32), kh.astype(jnp.float32),
                 ((2,), (2,))) * inv                      # (Bb, T, T) f32
        if with_bias:
            s = s + bias[:, None, :]
        p = jax.nn.softmax(s, axis=-1).astype(dt)
        o = _bmm(p.astype(jnp.float32), vh.astype(jnp.float32),
                 ((2,), (1,)))                            # (Bb, T, dk) f32
        outs.append(o.astype(dt))
    o_ref[...] = jnp.concatenate(outs, axis=-1)


def _reference_mha(q, k, v, bias, n_heads, dt):
    """Plain-XLA formulation with identical math (used for the VJP)."""
    B, T, D = q.shape
    dk = D // n_heads

    def split(y):
        return y.reshape(B, T, n_heads, dk).transpose(0, 2, 1, 3)

    qh, kh, vh = split(q), split(k), split(v)
    s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                   preferred_element_type=jnp.float32) / math.sqrt(dk)
    if bias is not None:
        s = s + bias[:, None, None, :].astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1).astype(dt)
    o = jnp.einsum("bhqk,bhkd->bhqd", p, vh,
                   preferred_element_type=jnp.float32).astype(dt)
    return o.transpose(0, 2, 1, 3).reshape(B, T, D)


@functools.lru_cache(maxsize=None)
def _make_fused_mha(H: int, B: int, T: int, D: int, dt_name: str,
                    with_bias: bool):
    dt = jnp.dtype(dt_name)
    B_blk = B
    for cand in range(min(B, BATCH_BLOCK), 0, -1):
        if B % cand == 0:
            B_blk = cand
            break
    grid = (B // B_blk,)
    blk = pl.BlockSpec((B_blk, T, D), lambda b: (b, 0, 0),
                       memory_space=pltpu.VMEM)
    # (B, 1, T) layout: Mosaic requires the last two block dims divisible
    # by (8, 128) or equal to the array dims - (1, T) satisfies "equal".
    bias_blk = pl.BlockSpec((B_blk, 1, T), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    in_specs = [blk, blk, blk, bias_blk]
    kern = functools.partial(_mha_kernel, H=H, T=T, D=D, dt=dt,
                             with_bias=with_bias)
    call = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((B, T, D), dt),
    )

    @jax.custom_vjp
    def fused(q, k, v, bias):
        return call(q, k, v, bias)

    def fused_fwd(q, k, v, bias):
        return call(q, k, v, bias), (q, k, v, bias)

    def fused_bwd(res, g):
        q, k, v, bias = res
        _, vjp = jax.vjp(
            lambda q_, k_, v_: _reference_mha(
                q_, k_, v_, bias if with_bias else None, H, dt), q, k, v)
        gq, gk, gv = vjp(g)
        return gq, gk, gv, jnp.zeros_like(bias)

    fused.defvjp(fused_fwd, fused_bwd)
    return fused


def supported(B: int, T: int, D: int, H: int) -> bool:
    return D % H == 0 and (D // H) % 8 == 0 and B >= 1 and T >= 2


def fused_mha(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
              n_heads: int, key_bias: Optional[jnp.ndarray] = None,
              ) -> jnp.ndarray:
    """Fused encoder self-attention.

    q/k/v: (B, T, D) head-unsplit projection outputs; key_bias: optional
    (B, T) additive bias on key logits (0 / -1e9 padding mask).  Returns
    (B, T, D) context, heads merged.
    """
    B, T, D = q.shape
    dt = q.dtype
    with_bias = key_bias is not None
    fused = _make_fused_mha(n_heads, B, T, D, jnp.dtype(dt).name, with_bias)
    if key_bias is None:
        key_bias = jnp.zeros((B, T), jnp.float32)
    return fused(q, k, v, key_bias.astype(jnp.float32).reshape(B, 1, T))
