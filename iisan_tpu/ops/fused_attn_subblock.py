"""Fused attention *subblock* Pallas kernel: qkv projection + MHA + output
projection in one pass.

Why: round-4 component attribution of the uncached step's dominant block
(`scripts/vit_attribution.py` -> VIT_ATTRIBUTION.json) isolated a ~24 ms
per-forward *composition tax* inside the ViT blocks — fusion boundaries
and relayouts where q/k/v and the attention context cross the Pallas
custom-call boundary between XLA GEMM fusions (the isolated parts sum to
~86 ms of a 110 ms block chain).  Both cheap XLA-side levers measured as
nulls (VIT_BLOCK_VARIANTS.json: merged-qkv GEMM 10% slower, bf16 LN
flat), so this kernel attacks the boundary itself: it absorbs the four
projection GEMMs into the attention kernel, leaving only the block input
(post-LN hidden states) and the attention output crossing the boundary —
two crossings per block instead of five, and no XLA GEMM feeding a
custom-call layout.

Per grid step (a block of Bb images/sequences), entirely in VMEM:
    x   (Bb, T, D)  -> qkv = x @ Wqkv + bqkv          one (Bb*T, D)x(D, 3D)
    per head h:        s = q_h k_h^T / sqrt(dk) (+key bias), softmax,
                       (optional in-kernel PRNG dropout), ctx_h = p v_h
    ctx (Bb, T, D)  -> out = ctx @ Wo + bo            one (Bb*T, D)x(D, D)
Wqkv/Wo ride constant BlockSpecs (fetched once, resident across the batch
grid).  Quantization math, softmax stability and the dropout PRNG match
``fused_attention._mha_kernel`` exactly; the projection dots accumulate
fp32 via preferred_element_type with bf16 operands, identical to the
module path's nn.Dense.

Backward: ``jax.custom_vjp`` differentiating the identical-math XLA
formulation (``_reference_subblock``).  Like fused_mha, the train-mode
in-kernel dropout masks are not reproducible from XLA, so the bwd raises
in that configuration; the frozen-tower paths that use this kernel
stop-gradient at the tap boundary (models/vit.py:144-145 analog) and
methods that train the towers keep the module path.

MEASURED VERDICT (scripts/vit_block_variants.py, real v5e,
VIT_BLOCK_VARIANTS.json `subblock` row): at the ViT-base uncached
geometry (352, 197, 768) the kernel LOSES — 113.9 ms vs 109.6 ms for the
12-block chain (-4 ms, -3.7%).  The crossings it removes are real, but
the serial per-head score/context loop inside one kernel invocation
costs more than XLA's boundary tax: XLA overlaps the per-head batched
matmuls of the module path across its fusions, while the kernel
serializes them per grid step.  models/{vit,bert}.py therefore keep
fused_mha as the default (`fused_tower_attention=True`); this kernel
stays wired behind `fused_tower_attention="subblock"` as a tested,
honestly-labeled negative result.  The small-T BERT geometry (352, 30,
768) was measured separately (scripts/bert_attn_variants.py ->
BERT_ATTN_VARIANTS.json): same verdict — fused_mha 19.4/24.3 ms
(eval/train) vs subblock 21.5/27.1 ms vs plain XLA 25.2/31.0 ms — so
fused_mha is the right default at BOTH towers.

Reference context: /root/reference/Code_Uncached/model/encoders.py runs
HF towers whose ViTLayer/BertLayer this subblock matches; the reference
has no fused-kernel analog (stock torch eager ops).
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
    """Largest divisor of B (<=8) whose footprint fits the VMEM budget.

    Resident weights (D x 3D + D x D at the input itemsize) are charged once; the
    per-step terms are the double-buffered x/out blocks, the fp32 qkv
    projection transient, its bf16 cast, one head's fp32 scores and the
    bf16 context.  Budget 12 MB of the ~16 MB VMEM (pallas_guide.md).
    Returns 0 when nothing fits (callers take the XLA path)."""
    weights = (D * 3 * D + D * D) * itemsize
    best = 0
    for cand in range(1, min(B, 8) + 1):
        if B % cand:
            continue
        xo = 2 * 2 * cand * T * D * itemsize          # x + out, double-buf
        qkv = cand * T * 3 * D * (4 + itemsize)       # f32 dot + cast
        scores = cand * T * max(T, 128) * 4
        ctx = cand * T * D * itemsize
        if weights + xo + qkv + scores + ctx <= 12 * 2 ** 20:
            best = cand
    return best


def _bmm(a, b, contract):
    return jax.lax.dot_general(a, b, ((contract), ((0,), (0,))),
                               preferred_element_type=jnp.float32)


def _subblock_kernel(x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, bias_ref,
                     seed_ref, o_ref, *, H, T, D, dt, with_bias, rate,
                     train):
    dk = D // H
    inv = 1.0 / math.sqrt(dk)
    if train:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    x = x_ref[...]                                     # (Bb, T, D) dt
    Bb = x.shape[0]
    # qkv projection: one (Bb*T, D) x (D, 3D) MXU dot, fp32 accumulate
    qkv = jax.lax.dot_general(
        x.reshape(Bb * T, D), wqkv_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[...].astype(jnp.float32)).astype(dt)
    qkv = qkv.reshape(Bb, T, 3 * D)
    if with_bias:
        bias = bias_ref[...][:, 0, :].astype(jnp.float32)  # (Bb, T)
    outs = []
    for h in range(H):
        sl_q = slice(h * dk, (h + 1) * dk)
        sl_k = slice(D + h * dk, D + (h + 1) * dk)
        sl_v = slice(2 * D + h * dk, 2 * D + (h + 1) * dk)
        qh, kh, vh = qkv[:, :, sl_q], qkv[:, :, sl_k], qkv[:, :, sl_v]
        s = _bmm(qh, kh, ((2,), (2,))) * inv           # (Bb, T, T) f32
        if with_bias:
            s = s + bias[:, None, :]
        p = jax.nn.softmax(s, axis=-1).astype(dt)
        if train:
            from .fused_user_encoder import _dropout_mask

            p = (p.astype(jnp.float32) * _dropout_mask(p.shape, rate)
                 ).astype(dt)
        o = _bmm(p, vh, ((2,), (1,)))                  # (Bb, T, dk) f32
        outs.append(o.astype(dt))
    ctx = jnp.concatenate(outs, axis=-1).reshape(Bb * T, D)
    out = jax.lax.dot_general(
        ctx, wo_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out = out + bo_ref[...].astype(jnp.float32)
    o_ref[...] = out.astype(dt).reshape(Bb, T, D)


def _reference_subblock(x, wqkv, bqkv, wo, bo, bias, n_heads, dt,
                        drop_rate: float = 0.0, dropout_rng=None):
    """Plain-XLA formulation with identical math (used for the VJP and
    the unsupported-geometry / off-TPU fallback).  drop_rate+dropout_rng:
    attention-probability dropout with nn.Dropout's keep-and-rescale
    semantics (draws differ from the kernel's on-chip PRNG — dropout
    masks are stochastic, not part of numerics parity)."""
    B, T, D = x.shape
    dk = D // n_heads
    qkv = (jnp.einsum("btd,de->bte", x, wqkv,
                      preferred_element_type=jnp.float32)
           + bqkv.astype(jnp.float32)).astype(dt)
    q, k, v = qkv[..., :D], qkv[..., D:2 * D], qkv[..., 2 * D:]

    def split(y):
        return y.reshape(B, T, n_heads, dk).transpose(0, 2, 1, 3)

    qh, kh, vh = split(q), split(k), split(v)
    s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                   preferred_element_type=jnp.float32) / math.sqrt(dk)
    if bias is not None:
        s = s + bias[:, None, None, :].astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1).astype(dt)
    if dropout_rng is not None and drop_rate > 0.0:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - drop_rate, p.shape)
        p = jnp.where(keep, p / jnp.asarray(1.0 - drop_rate, dt),
                      jnp.zeros((), dt))
    ctx = jnp.einsum("bhqk,bhkd->bhqd", p, vh,
                     preferred_element_type=jnp.float32).astype(dt)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(B, T, D)
    out = jnp.einsum("btd,de->bte", ctx, wo,
                     preferred_element_type=jnp.float32)
    return (out + bo.astype(jnp.float32)).astype(dt)


@functools.lru_cache(maxsize=None)
def _make_fused_subblock(H: int, B: int, T: int, D: int, dt_name: str,
                         with_bias: bool, rate: float, train: bool):
    dt = jnp.dtype(dt_name)
    B_blk = _pick_batch_block(B, T, D, dt.itemsize)
    grid = (B // B_blk,)
    x_blk = pl.BlockSpec((B_blk, T, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    # weights/biases: constant index maps -> fetched once, resident
    wqkv_blk = pl.BlockSpec((D, 3 * D), lambda b: (0, 0),
                            memory_space=pltpu.VMEM)
    bqkv_blk = pl.BlockSpec((3 * D,), lambda b: (0,),
                            memory_space=pltpu.VMEM)
    wo_blk = pl.BlockSpec((D, D), lambda b: (0, 0),
                          memory_space=pltpu.VMEM)
    bo_blk = pl.BlockSpec((D,), lambda b: (0,),
                          memory_space=pltpu.VMEM)
    bias_blk = pl.BlockSpec((B_blk, 1, T), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    seed_blk = pl.BlockSpec(memory_space=pltpu.SMEM)
    kern = functools.partial(_subblock_kernel, H=H, T=T, D=D, dt=dt,
                             with_bias=with_bias, rate=rate, train=train)
    call = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[x_blk, wqkv_blk, bqkv_blk, wo_blk, bo_blk, bias_blk,
                  seed_blk],
        out_specs=x_blk,
        out_shape=jax.ShapeDtypeStruct((B, T, D), dt),
    )

    @jax.custom_vjp
    def fused(x, wqkv, bqkv, wo, bo, bias, seed):
        return call(x, wqkv, bqkv, wo, bo, bias, seed)

    def fused_fwd(x, wqkv, bqkv, wo, bo, bias, seed):
        return call(x, wqkv, bqkv, wo, bo, bias, seed), \
            (x, wqkv, bqkv, wo, bo, bias, seed)

    def fused_bwd(res, g):
        if train:
            # In-kernel dropout masks are not reproducible from XLA;
            # callers gate the kernel to frozen-tower paths where the
            # gradient stops before attention.
            raise NotImplementedError(
                "fused_attn_subblock backward with active attention "
                "dropout; use the module path for methods that train "
                "the towers")
        x, wqkv, bqkv, wo, bo, bias, seed = res
        _, vjp = jax.vjp(
            lambda x_, wqkv_, bqkv_, wo_, bo_: _reference_subblock(
                x_, wqkv_, bqkv_, wo_, bo_,
                bias[:, 0, :] if with_bias else None, H, dt),
            x, wqkv, bqkv, wo, bo)
        gx, gwqkv, gbqkv, gwo, gbo = vjp(g)
        import numpy as np

        return (gx, gwqkv, gbqkv, gwo, gbo, jnp.zeros_like(bias),
                np.zeros(seed.shape, jax.dtypes.float0))

    fused.defvjp(fused_fwd, fused_bwd)
    return fused


def supported(B: int, T: int, D: int, H: int, itemsize: int = 2) -> bool:
    return (D % H == 0 and (D // H) % 8 == 0 and B >= 1 and T >= 2
            and _pick_batch_block(B, T, D, itemsize) > 0)


def fused_attn_subblock(x: jnp.ndarray, wqkv: jnp.ndarray,
                        bqkv: jnp.ndarray, wo: jnp.ndarray,
                        bo: jnp.ndarray, n_heads: int,
                        key_bias: Optional[jnp.ndarray] = None,
                        drop_rate: float = 0.0,
                        dropout_rng=None) -> jnp.ndarray:
    """Fused qkv-projection + MHA + output-projection.

    x: (B, T, D) post-LayerNorm hidden states; wqkv: (D, 3D) concat of
    the query|key|value kernels (column order q, k, v); bqkv: (3D,);
    wo/bo: output projection.  key_bias: optional (B, T) additive key
    bias (0 / -1e9 padding mask); drop_rate/dropout_rng: attention-
    probability dropout (train mode when both set).  Returns the
    pre-residual attention output (B, T, D).
    """
    B, T, D = x.shape
    dt = x.dtype
    with_bias = key_bias is not None
    train = dropout_rng is not None and drop_rate > 0.0
    if not supported(B, T, D, n_heads, jnp.dtype(dt).itemsize):
        if train:
            raise NotImplementedError(
                "fused_attn_subblock fallback with attention dropout; "
                "gate on supported() and use the module path")
        return _reference_subblock(x, wqkv, bqkv, wo, bo, key_bias,
                                   n_heads, dt)
    fused = _make_fused_subblock(n_heads, B, T, D, jnp.dtype(dt).name,
                                 with_bias, float(drop_rate), train)
    if key_bias is None:
        key_bias = jnp.zeros((B, T), jnp.float32)
    if train:
        import numpy as np

        seed = jax.random.randint(dropout_rng, (1,), 0,
                                  np.int32(2 ** 31 - 1), dtype=jnp.int32)
    else:
        seed = jnp.zeros((1,), jnp.int32)
    return fused(x, wqkv, bqkv, wo, bo,
                 key_bias.astype(jnp.float32).reshape(B, 1, T), seed)
