"""Fused W8A8 linear Pallas kernel for the int8 frozen towers.

Why: the XLA lowering of ``int8_linear.int8_matmul`` materializes the
quantized activations and the per-row scales in HBM between separate
fusions (absmax reduce -> quantize -> s8 dot -> dequant), so at the
BERT/ViT-base 768-dim tower geometry the int8 path measured *flat* against
bf16 (INT8_TOWER_AB.json: 1.00x at bs 32) — the 2x int8 MXU rate
(369.8 TOPS vs 191.9 TFLOPs bf16 measured on this v5e) was fully eaten by
the extra elementwise HBM round trips.  This kernel does the whole thing
in one pass per activation tile: load the bf16 x block into VMEM, quantize
it once into a VMEM scratch (per-row absmax, on the first N-step of each
row block), run the int8 x int8 -> int32 dot on the MXU against streamed
int8 weight columns, and dequantize on the way out.  HBM traffic is the
same as a plain bf16 matmul (read bf16 x once per row block, read int8 w
once, write bf16 y) while the contraction runs at the int8 rate.

Quantization math is kept *identical* to ``int8_linear.int8_matmul``
(per-row symmetric absmax, rint, zero-row guard).  The two paths agree to
~1e-3 absolute, not bitwise: the ``absmax / 127`` division can differ by
1 ulp across backends, which flips ``rint`` on exact-.5 ties (measured: 1
flipped activation in 65k at f32; each flip moves the output by at most
127 * row_scale * col_scale).  Tested in interpret mode on CPU and
against the XLA path on the chip (tests/test_int8_towers.py).

Backward: ``jax.custom_vjp`` that differentiates the XLA formulation
(identical semantics incl. rint's zero JVP).  The int8 towers are gated to
frozen-tower configs (models/towers.py), so in supported training configs
the bwd never runs — the taps are stop_gradient'ed (towers.py:144-145).

Reference context: the reference runs its frozen towers in fp16 autocast
(/root/reference/Code_Uncached/run.py:380-385); there is no reference
analog of int8 tower execution — this is TPU-native headroom.

STATUS — documented negative result (round 4). The one-pass design did
not beat XLA's fusion pipeline on this chip. K/N sweep at M=8192/32768
(INT8_IMPL_BENCH.json): the kernel wins only isolated bandwidth-bound
768-wide single matmuls (+6-11% vs int8_xla) and loses everywhere
compute-bound — 0.96-0.94x at 2048-4096, 0.55-0.62x at Versa's 8192
widths, 0.72x on the composed 12-layer tower dense chain, 0.58-0.62x
end-to-end in the tower A/B (INT8_TOWER_AB.json). The likely cause is
visible in the sweep shape: XLA pipelines its quantize fusion with the
s8 MXU dot across fusion boundaries better than this kernel's serial
per-tile quantize->dot, and the gap widens exactly where the MXU is
busiest. 'int8_pallas' was therefore removed from the user-facing
``tower_quant`` values (models/towers.py raises with this pointer);
the kernel stays tested (tests/test_int8_towers.py) and directly
benchmarkable (scripts/bench_int8_impls.py --sweep).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Mosaic's scoped-VMEM stack limit is 16 MB on this toolchain; budget the
# per-step working set (double-buffered blocks + scratch + f32 temps)
# comfortably below it.
_VMEM_BUDGET = 12 * 2 ** 20
_LANES = 128


def _pick_blocks(K: int, N: int, xsz: int, osz: int):
    """(row block, col block) whose working set fits the budget:
    double-buffered x block, int8 xq + f32 sx scratch, the f32 temp of the
    quantize step, double-buffered int8 w columns, f32 accumulator and
    double-buffered output block.  (0, 0) when nothing fits."""
    for bm in (1024, 512, 256, 128):
        for bn in (1024, 768, 512, 256, 128):
            if bn > N or (N % bn):
                continue
            use = (2 * bm * K * xsz      # x in, double-buffered
                   + bm * K              # xq scratch (int8)
                   + bm * K * 4          # f32 temp during quantize
                   + 4 * bm              # sx scratch
                   + 2 * K * bn          # w int8, double-buffered
                   + bm * bn * 4         # s32/f32 accumulator
                   + 2 * bm * bn * osz   # y out, double-buffered
                   + 4 * bn * 8)         # kscale + bias blocks (f32, dbl)
            if use <= _VMEM_BUDGET:
                return bm, bn
    return 0, 0


def supported(K: int, N: int, xsz: int = 2, osz: int = 2) -> bool:
    """K must be lane-aligned (it is the contraction and the scratch minor
    dim); N must split into lane-aligned column blocks.  Covers every
    shipped tower geometry (768/3072 base, 1024/4096 large)."""
    return (K % _LANES == 0 and N % _LANES == 0
            and _pick_blocks(K, N, xsz, osz)[0] > 0)


def _w8a8_kernel(*refs, out_dt, with_bias):
    # Pallas passes refs positionally: inputs, outputs, then scratch.
    if with_bias:
        x_ref, w_ref, s_ref, b_ref, o_ref, xq_ref, sx_ref = refs
    else:
        (x_ref, w_ref, s_ref, o_ref, xq_ref, sx_ref), b_ref = refs, None

    @pl.when(pl.program_id(1) == 0)
    def _quantize():
        # Same statement order as int8_linear.int8_matmul so the paths
        # agree modulo 1-ulp division differences (module docstring).
        xf = x_ref[...].astype(jnp.float32)                    # (bm, K)
        absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)  # (bm, 1)
        sx = absmax / 127.0
        inv = jnp.where(sx > 0, 1.0 / jnp.where(sx > 0, sx, 1.0), 0.0)
        xq_ref[...] = jnp.clip(jnp.rint(xf * inv), -127, 127
                               ).astype(jnp.int8)
        sx_ref[...] = sx

    acc = jax.lax.dot_general(
        xq_ref[...], w_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)                       # (bm, bn)
    y = acc.astype(jnp.float32) * (sx_ref[...]
                                   * s_ref[...].astype(jnp.float32))
    if with_bias:
        y = y + b_ref[...].astype(jnp.float32)
    o_ref[...] = y.astype(out_dt)


@functools.lru_cache(maxsize=None)
def _make_w8a8(M: int, K: int, N: int, dt_name: str, out_dt_name: str,
               with_bias: bool, interpret: bool):
    xsz = jnp.dtype(dt_name).itemsize
    osz = jnp.dtype(out_dt_name).itemsize
    bm, bn = _pick_blocks(K, N, xsz, osz)
    # n is the fast axis: the x block (indexed by m only) stays resident
    # while the weight columns stream; the scratch quantization runs once
    # per row block at n == 0.
    grid = (M // bm, N // bn)
    x_spec = pl.BlockSpec((bm, K), lambda m, n: (m, 0),
                          memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((K, bn), lambda m, n: (0, n),
                          memory_space=pltpu.VMEM)
    s_spec = pl.BlockSpec((1, bn), lambda m, n: (0, n),
                          memory_space=pltpu.VMEM)
    in_specs = [x_spec, w_spec, s_spec]
    if with_bias:
        in_specs.append(pl.BlockSpec((1, bn), lambda m, n: (0, n),
                                     memory_space=pltpu.VMEM))
    out_spec = pl.BlockSpec((bm, bn), lambda m, n: (m, n),
                            memory_space=pltpu.VMEM)
    kern = functools.partial(_w8a8_kernel, out_dt=jnp.dtype(out_dt_name),
                             with_bias=with_bias)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.dtype(out_dt_name)),
        scratch_shapes=[pltpu.VMEM((bm, K), jnp.int8),
                        pltpu.VMEM((bm, 1), jnp.float32)],
        interpret=interpret,
    )


def fused_w8a8_matmul(x, kernel_q, kscale, bias, out_dtype,
                      interpret: bool = False):
    """One-kernel W8A8 linear: y = dequant(quant_rows(x) @ kernel_q) + bias.

    x: (..., K) float; kernel_q: (K, N) int8; kscale: (N,) f32;
    bias: (N,) f32 or None.  Callers gate on ``supported(K, N)``.
    Rows are padded to the kernel's row block; pad rows are all-zero and
    the zero-scale guard keeps them exact zeros."""
    K, N = kernel_q.shape
    lead = x.shape[:-1]
    M = 1
    for d in lead:
        M *= d
    x2 = x.reshape(M, K)
    xsz = jnp.dtype(x.dtype).itemsize
    osz = jnp.dtype(out_dtype).itemsize
    bm, _ = _pick_blocks(K, N, xsz, osz)
    if bm == 0 or K % _LANES or N % _LANES:
        raise ValueError(
            f"fused_w8a8_matmul: unsupported geometry K={K}, N={N}, "
            f"x dtype={jnp.dtype(x.dtype).name} (K and N must be "
            f"multiples of {_LANES} and a block must fit the "
            f"{_VMEM_BUDGET >> 20} MB VMEM budget); gate callers on "
            "int8_pallas.supported(K, N)")
    Mp = ((M + bm - 1) // bm) * bm
    if Mp != M:
        x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))
    args = [x2, kernel_q, kscale.reshape(1, N)]
    if bias is not None:
        args.append(bias.astype(jnp.float32).reshape(1, N))
    call = _make_w8a8(Mp, K, N, jnp.dtype(x.dtype).name,
                      jnp.dtype(out_dtype).name, bias is not None,
                      interpret)

    @jax.custom_vjp
    def run(x2, kernel_q, kscale2, *rest):
        return call(x2, kernel_q, kscale2, *rest)

    def run_fwd(x2, kernel_q, kscale2, *rest):
        return run(x2, kernel_q, kscale2, *rest), (x2, kernel_q, kscale2,
                                                   rest)

    def run_bwd(res, g):
        # Differentiate the identical-math XLA formulation: rint blocks
        # the main path (zero JVP) but a residual gradient flows through
        # the absmax -> row-scale chain — matching the XLA int8 path's
        # semantics exactly; frozen-tower gating means this only ever
        # runs under tests.
        import numpy as np

        from .int8_linear import int8_matmul

        x2, kernel_q, kscale2, rest = res
        b = rest[0] if rest else None
        diff_args = (x2, kscale2) + ((b,) if b is not None else ())

        def f(*da):
            xx, ks = da[0], da[1]
            bb = da[2] if b is not None else None
            return int8_matmul(xx, kernel_q, ks.reshape(-1), bb, g.dtype)

        _, vjp = jax.vjp(f, *diff_args)
        grads = vjp(g)
        dx, dks = grads[0], grads[1].reshape(kscale2.shape)
        db = (grads[2],) if b is not None else ()
        zero_int = np.zeros(kernel_q.shape, jax.dtypes.float0)
        return (dx, zero_int, dks) + db

    run.defvjp(run_fwd, run_bwd)
    y = run(*args)
    if Mp != M:
        y = y[:M]
    return y.reshape(*lead, N)
