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

Scope: encoder self-attention.  An optional additive key bias (B, T)
covers BERT's padding mask; attention-probability dropout (BERT trains its
frozen towers in train mode with rate 0.1, matching the reference running
HF towers un-eval()ed) is generated on-chip with the Pallas PRNG like the
fused user-encoder kernel.

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
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _pick_batch_block(B, T, D, itemsize=2):
    """Largest divisor of B whose double-buffered Q/K/V/O blocks plus one
    head's fp32 scores stay well inside the 16 MB VMEM budget.

    Returns 0 when even a block of 1 image overflows the budget (very
    large T); callers must then take the XLA module path (ADVICE r1).
    ``itemsize`` is the q/k/v element size — fp32 runs halve the feasible
    block, so the model must not assume bf16."""
    best = 0
    for cand in range(1, min(B, 32) + 1):
        if B % cand:
            continue
        qkv = 4 * cand * T * D * itemsize * 2   # q,k,v,o double-buffered
        scores = 2 * cand * T * max(T, 128) * 4
        if qkv + scores <= 8 * 2 ** 20:
            best = cand
    return best


def _bmm(a, b, contract):
    return jax.lax.dot_general(a, b, ((contract), ((0,), (0,))),
                               preferred_element_type=jnp.float32)


def _mha_kernel(q_ref, k_ref, v_ref, bias_ref, seed_ref, o_ref, *, H, T, D,
                dt, with_bias, rate, train):
    dk = D // H
    inv = 1.0 / math.sqrt(dk)
    if train:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    q = q_ref[...]  # (Bb, T, D) dt
    k = k_ref[...]
    v = v_ref[...]
    if with_bias:
        bias = bias_ref[...][:, 0, :].astype(jnp.float32)  # (Bb, T) key bias
    outs = []
    for h in range(H):
        sl = slice(h * dk, (h + 1) * dk)
        qh, kh, vh = q[:, :, sl], k[:, :, sl], v[:, :, sl]
        # Keep matmul OPERANDS in the compute dtype and accumulate fp32
        # (preferred_element_type) - f32 operands would run the MXU at a
        # fraction of its bf16 rate, and the module path's einsums use
        # bf16 operands with fp32 accumulation too.
        s = _bmm(qh, kh, ((2,), (2,))) * inv              # (Bb, T, T) f32
        if with_bias:
            s = s + bias[:, None, :]
        p = jax.nn.softmax(s, axis=-1).astype(dt)
        if train:
            from .fused_user_encoder import _dropout_mask

            p = (p.astype(jnp.float32) * _dropout_mask(p.shape, rate)
                 ).astype(dt)
        o = _bmm(p, vh, ((2,), (1,)))                     # (Bb, T, dk) f32
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
                    with_bias: bool, rate: float, train: bool):
    dt = jnp.dtype(dt_name)
    B_blk = _pick_batch_block(B, T, D, dt.itemsize)
    grid = (B // B_blk,)
    blk = pl.BlockSpec((B_blk, T, D), lambda b: (b, 0, 0),
                       memory_space=pltpu.VMEM)
    # (B, 1, T) layout: Mosaic requires the last two block dims divisible
    # by (8, 128) or equal to the array dims - (1, T) satisfies "equal".
    bias_blk = pl.BlockSpec((B_blk, 1, T), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    seed_blk = pl.BlockSpec(memory_space=pltpu.SMEM)
    in_specs = [blk, blk, blk, bias_blk, seed_blk]
    kern = functools.partial(_mha_kernel, H=H, T=T, D=D, dt=dt,
                             with_bias=with_bias, rate=rate, train=train)
    call = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((B, T, D), dt),
    )

    @jax.custom_vjp
    def fused(q, k, v, bias, seed):
        return call(q, k, v, bias, seed)

    def fused_fwd(q, k, v, bias, seed):
        return call(q, k, v, bias, seed), (q, k, v, bias, seed)

    def fused_bwd(res, g):
        if train:
            # The in-kernel dropout masks are not reproducible from XLA;
            # callers gate the kernel to frozen-tower paths where the
            # gradient stops before attention (models/{vit,bert}.py).
            raise NotImplementedError(
                "fused_mha backward with active attention dropout; use the "
                "module path for methods that train the towers")
        q, k, v, bias, seed = res
        # the residual bias is the kernel-shaped (B, 1, T); _reference_mha
        # expects the caller-shaped (B, T)
        _, vjp = jax.vjp(
            lambda q_, k_, v_: _reference_mha(
                q_, k_, v_, bias[:, 0, :] if with_bias else None, H, dt),
            q, k, v)
        gq, gk, gv = vjp(g)
        import numpy as np

        return (gq, gk, gv, jnp.zeros_like(bias),
                np.zeros(seed.shape, jax.dtypes.float0))

    fused.defvjp(fused_fwd, fused_bwd)
    return fused


def supported(B: int, T: int, D: int, H: int, itemsize: int = 2) -> bool:
    return (D % H == 0 and (D // H) % 8 == 0 and B >= 1 and T >= 2
            and _pick_batch_block(B, T, D, itemsize) > 0)


def fused_mha(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
              n_heads: int, key_bias: Optional[jnp.ndarray] = None,
              drop_rate: float = 0.0, dropout_rng=None) -> jnp.ndarray:
    """Fused encoder self-attention.

    q/k/v: (B, T, D) head-unsplit projection outputs; key_bias: optional
    (B, T) additive bias on key logits (0 / -1e9 padding mask);
    drop_rate/dropout_rng: attention-probability dropout (train mode when
    both set).  Returns (B, T, D) context, heads merged.
    """
    B, T, D = q.shape
    dt = q.dtype
    with_bias = key_bias is not None
    train = dropout_rng is not None and drop_rate > 0.0
    if not supported(B, T, D, n_heads, jnp.dtype(dt).itemsize):
        # Geometry the kernel cannot tile (e.g. T so large the block-1
        # footprint overflows VMEM): identical-math XLA path.
        if train:
            raise NotImplementedError(
                "fused_mha fallback with attention dropout; gate on "
                "supported() and use the module path")
        return _reference_mha(q, k, v, key_bias, n_heads, dt)
    fused = _make_fused_mha(n_heads, B, T, D, jnp.dtype(dt).name, with_bias,
                            float(drop_rate), train)
    if key_bias is None:
        key_bias = jnp.zeros((B, T), jnp.float32)
    if train:
        import numpy as np

        seed = jax.random.randint(dropout_rng, (1,), 0,
                                  np.int32(2 ** 31 - 1), dtype=jnp.int32)
    else:
        seed = jnp.zeros((1,), jnp.int32)
    return fused(q, k, v, key_bias.astype(jnp.float32).reshape(B, 1, T),
                 seed)
