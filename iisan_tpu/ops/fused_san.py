"""Pallas TPU kernel: fused gated side-adapter cascade.

The SAN's intra-modal branch is a K-step sequential cascade of tiny
bottleneck adapters (/root/reference/Code_Cached/model/model.py:318-332):

    c_0   = carry-init
    f_i   = sigmoid(theta_i/0.1) * tap_i + (1 - sigmoid(theta_i/0.1)) * c_i
    c_i+1 = W_up_i @ act(W_dn_i @ f_i + b_dn_i) + b_up_i + f_i

As ~4K separate XLA ops these (N x D) x (D x R) matmuls are dispatch- and
HBM-bound: every step round-trips N*D activations.  This kernel runs the
whole cascade in one ``pallas_call``: the row-tile of taps and the carry
stay resident in VMEM across all K steps, all 2K weight matrices are loaded
into VMEM once, and only the final carry (plus the per-step carries needed
for backward) leave the chip.

Backward is a hand-derived VJP over the saved carries (recomputing the
cheap bottleneck activations), vectorized in jnp - the heavy lifting
(weight-gradient matmuls) is MXU-shaped already.

VMEM budget at ViT/BERT-base geometry (K=7, D=768, R=64, tile 256 rows,
bf16): taps 2.6 MB + carries 3 MB + weights 1.4 MB - comfortably under the
16 MB/core budget (pallas_guide.md "Memory Hierarchy").
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GATE_TEMPERATURE = 0.1


def _act(z, activation: str):
    if activation == "GELU":
        return jax.nn.gelu(z, approximate=False)
    return jnp.maximum(z, 0.0)


def _act_grad(z, activation: str):
    if activation == "GELU":
        return jax.vjp(lambda t: jax.nn.gelu(t, approximate=False), z)[1]
    return lambda g: (jnp.where(z > 0, g, 0.0),)


def _cascade_kernel(gates_ref, taps_ref, wd_ref, bd_ref, wu_ref, bu_ref,
                    c0_ref, out_ref, *, k: int, activation: str,
                    gated: bool):
    """One row-tile, all K steps.  Refs:
    gates (K,) SMEM scalar-prefetch; taps (T, K, D); wd (K, D, R);
    bd (K, R); wu (K, R, D); bu (K, D); c0 (T, D);
    out (T, D); carries (T, K+1, D)."""
    c = c0_ref[:]
    dtype = c.dtype
    for i in range(k):  # K is static and small: unrolled in-kernel
        if gated:
            g = jax.nn.sigmoid(
                gates_ref[i] / GATE_TEMPERATURE).astype(jnp.float32)
            f = (g * taps_ref[:, i, :].astype(jnp.float32)
                 + (1.0 - g) * c.astype(jnp.float32)).astype(dtype)
        else:
            # fusion_method != "gated": plain additive fusion
            # (model.py:328-330)
            f = taps_ref[:, i, :] + c
        prec = jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None
        z = jnp.dot(f, wd_ref[i], preferred_element_type=jnp.float32,
                    precision=prec) + bd_ref[i].astype(jnp.float32)
        a = _act(z, activation).astype(dtype)
        up = jnp.dot(a, wu_ref[i], preferred_element_type=jnp.float32,
                     precision=prec) + bu_ref[i].astype(jnp.float32)
        c = (up + f.astype(jnp.float32)).astype(dtype)
    out_ref[:] = c


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def fits_vmem(k: int, d: int, r: int, tile: int = 128,
              budget_bytes: int = 12 * 2**20, bpe: int = 2) -> bool:
    """Conservative VMEM estimate: can the all-weights-resident kernel fit
    the ~16 MB/core budget?  Geometries that don't (Versa's 8192-dim
    caches) dispatch to the step-streamed kernel instead, which only needs
    one step's weights at a time.  ``bpe`` is the element size — fp32
    inputs double every term, so the bf16 default must not be assumed."""
    weights = k * (d * r + r + r * d + d) * bpe
    tiles = 2 * (tile * k * d + 3 * tile * d) * bpe  # taps + c0/out, buffered
    return weights + tiles < budget_bytes


def _cascade_kernel_streamed(gates_ref, taps_ref, wd_ref, bd_ref, wu_ref,
                             bu_ref, c0_ref, out_ref, carry_scr, *, k: int,
                             activation: str, gated: bool):
    """Step-streamed variant for wide-D geometries: grid = (N tiles, K);
    only step k's weights are VMEM-resident, the running carry lives in a
    persistent fp32 scratch across the K inner grid iterations.

    Refs per (i, k): taps (1, T, D) (K-leading layout); wd (1, D, R);
    bd (1, 1, R); wu (1, R, D); bu (1, 1, D); c0 (T, D);
    out (T, D) (written at k == K-1); carry_scr (T, D) fp32 scratch."""
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _():
        carry_scr[:] = c0_ref[:].astype(jnp.float32)

    c = carry_scr[:]
    dtype = c0_ref.dtype
    if gated:
        g = jax.nn.sigmoid(gates_ref[ki] / GATE_TEMPERATURE).astype(jnp.float32)
        f = g * taps_ref[0].astype(jnp.float32) + (1.0 - g) * c
    else:
        f = taps_ref[0].astype(jnp.float32) + c
    # NOTE: matmuls run at MXU default precision (bf16 multiplies for fp32
    # inputs, fp32 accumulate) - Precision.HIGHEST fails to lower for these
    # wide-D shapes; accumulation order differs from XLA by row tile, so
    # fp32 results agree with the XLA path to ~1e-2 relative at D=8192
    # (production runs are bf16 anyway).
    z = jnp.dot(f.astype(dtype), wd_ref[0],
                preferred_element_type=jnp.float32) \
        + bd_ref[0, 0].astype(jnp.float32)
    a = _act(z, activation).astype(dtype)
    up = jnp.dot(a, wu_ref[0], preferred_element_type=jnp.float32) \
        + bu_ref[0, 0].astype(jnp.float32)
    c = up + f
    carry_scr[:] = c

    @pl.when(ki == k - 1)
    def _():
        out_ref[:] = c.astype(dtype)


def streamed_tile_rows(d: int, r: int, budget_bytes: int = 14 * 2**20) -> int:
    """Row-tile for the step-streamed kernel under the VMEM budget.

    Per tile row: taps + c0 + out (bf16, double-buffered) + the fp32 carry
    scratch = 16*d bytes.  One step's weights, double-buffered: ~8*d*r.
    Returns 0 when even the per-step weights blow the budget (dispatch
    falls back to the XLA cascade then).
    """
    weights = 2 * ((d * r + r * d) * 2 + (r + d) * 2)
    per_row = 16 * d
    avail = budget_bytes - weights
    if avail < per_row * 8:
        return 0
    return min(avail // per_row // 8 * 8, 512)


def _fused_cascade_streamed_impl(gates, taps, wd, bd, wu, bu, c0,
                                 activation: str, interpret: bool,
                                 gated: bool = True):
    n, k, d = taps.shape
    r = wd.shape[-1]
    tile = min(_round_up(max(n, 8), 8), streamed_tile_rows(d, r))
    n_pad = _round_up(n, tile)
    if n_pad != n:
        taps = jnp.pad(taps, ((0, n_pad - n), (0, 0), (0, 0)))
        c0 = jnp.pad(c0, ((0, n_pad - n), (0, 0)))

    grid = (n_pad // tile, k)  # k iterates fastest (sequential per core)
    kernel = functools.partial(_cascade_kernel_streamed, k=k,
                               activation=activation, gated=gated)
    taps_kl = taps.transpose(1, 0, 2)  # (K, N, D): K-leading for tiling
    (out,) = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,  # gates
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, tile, d), lambda i, ki, *_: (ki, i, 0)),
                pl.BlockSpec((1, d, r), lambda i, ki, *_: (ki, 0, 0)),
                pl.BlockSpec((1, 1, r), lambda i, ki, *_: (ki, 0, 0)),
                pl.BlockSpec((1, r, d), lambda i, ki, *_: (ki, 0, 0)),
                pl.BlockSpec((1, 1, d), lambda i, ki, *_: (ki, 0, 0)),
                pl.BlockSpec((tile, d), lambda i, ki, *_: (i, 0)),
            ],
            out_specs=[
                pl.BlockSpec((tile, d), lambda i, ki, *_: (i, 0)),
            ],
            scratch_shapes=[pltpu.VMEM((tile, d), jnp.float32)],
        ),
        out_shape=[jax.ShapeDtypeStruct((n_pad, d), taps.dtype)],
        interpret=interpret,
    )(gates, taps_kl, wd, bd[:, None, :], wu, bu[:, None, :], c0)
    return out[:n]


def _fused_cascade_fwd_impl(gates, taps, wd, bd, wu, bu, c0,
                            activation: str, interpret: bool,
                            gated: bool = True):
    n, k, d = taps.shape
    r = wd.shape[-1]
    # Tile sized so (taps + carries + out + c0) x double-buffering plus the
    # K weight matrices stay under the ~16 MB VMEM budget at D=768, K<=13.
    tile = min(_round_up(max(n, 8), 8), 128)
    n_pad = _round_up(n, tile)
    if n_pad != n:
        taps = jnp.pad(taps, ((0, n_pad - n), (0, 0), (0, 0)))
        c0 = jnp.pad(c0, ((0, n_pad - n), (0, 0)))

    grid = (n_pad // tile,)
    kernel = functools.partial(_cascade_kernel, k=k, activation=activation,
                               gated=gated)
    (out,) = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,  # gates
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile, k, d), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((k, d, r), lambda i, *_: (0, 0, 0)),
                pl.BlockSpec((k, r), lambda i, *_: (0, 0)),
                pl.BlockSpec((k, r, d), lambda i, *_: (0, 0, 0)),
                pl.BlockSpec((k, d), lambda i, *_: (0, 0)),
                pl.BlockSpec((tile, d), lambda i, *_: (i, 0)),
            ],
            out_specs=[
                pl.BlockSpec((tile, d), lambda i, *_: (i, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, d), taps.dtype),
        ],
        interpret=interpret,
    )(gates, taps, wd, bd, wu, bu, c0)
    return out[:n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def fused_cascade(gates, taps, wd, bd, wu, bu, c0,
                  activation: str = "RELU", interpret: bool = False,
                  gated: bool = True):
    """Fused K-step gated adapter cascade.

    gates (K,), taps (N, K, D), wd (K, D, R), bd (K, R), wu (K, R, D),
    bu (K, D), c0 (N, D) -> final carry (N, D).
    """
    return _dispatch_fwd(gates, taps, wd, bd, wu, bu, c0,
                         activation, interpret, gated)


def _dispatch_fwd(gates, taps, wd, bd, wu, bu, c0, activation, interpret,
                  gated):
    n, k, d = taps.shape
    r = wd.shape[-1]
    if fits_vmem(k, d, r, bpe=taps.dtype.itemsize):
        impl = _fused_cascade_fwd_impl
    elif taps.dtype == jnp.float32 or streamed_tile_rows(d, r) == 0:
        # The streamed wide-D kernel is bf16-only: its dots cannot lower at
        # Precision.HIGHEST, so fp32 inputs would silently degrade to ~1e-2
        # relative agreement at D=8192.  fp32 wide-D goes through the XLA
        # cascade instead (the custom VJP below stays valid - it recomputes
        # in fp32 regardless of the forward implementation).
        impl = lambda g, t, a, b, c, d2, e, act, interp, gt: \
            reference_cascade(g, t, a, b, c, d2, e, act, gt)
    else:
        impl = _fused_cascade_streamed_impl
    return impl(gates, taps, wd, bd, wu, bu, c0, activation, interpret, gated)


def _fwd(gates, taps, wd, bd, wu, bu, c0, activation, interpret, gated):
    out = _dispatch_fwd(gates, taps, wd, bd, wu, bu, c0,
                        activation, interpret, gated)
    # Rematerialization: save only the inputs; backward recomputes the K
    # per-step carries (cheap - the cascade is a few tiny matmuls) instead
    # of streaming an (N, K+1, D) residual tensor through HBM.
    return out, (gates, taps, wd, bd, wu, bu, c0)


def _recompute_carries(gates, taps, wd, bd, wu, bu, c0, activation, gated):
    f32 = jnp.float32
    c = c0.astype(f32)
    carries = [c]
    for i in range(taps.shape[1]):
        t_i = taps[:, i, :].astype(f32)
        if gated:
            g = jax.nn.sigmoid(gates[i] / GATE_TEMPERATURE).astype(f32)
            f = g * t_i + (1.0 - g) * c
        else:
            f = t_i + c
        z = jnp.dot(f, wd[i].astype(f32)) + bd[i].astype(f32)
        a = _act(z, activation)
        c = jnp.dot(a, wu[i].astype(f32)) + bu[i].astype(f32) + f
        carries.append(c)
    return jnp.stack(carries, axis=1)  # (N, K+1, D) fp32


def _bwd(activation, interpret, gated, res, dc_out):
    gates, taps, wd, bd, wu, bu, c0 = res
    carries = _recompute_carries(gates, taps, wd, bd, wu, bu, c0,
                                 activation, gated)
    n, k, d = taps.shape
    f32 = jnp.float32
    dc = dc_out.astype(f32)
    dgates = []
    dtaps = []
    dwd, dbd, dwu, dbu = [], [], [], []
    for i in range(k - 1, -1, -1):
        c_i = carries[:, i, :].astype(f32)
        t_i = taps[:, i, :].astype(f32)
        if gated:
            g = jax.nn.sigmoid(gates[i] / GATE_TEMPERATURE).astype(f32)
            f = g * t_i + (1.0 - g) * c_i
        else:
            g = jnp.float32(1.0)
            f = t_i + c_i
        z = jnp.dot(f, wd[i].astype(f32)) + bd[i].astype(f32)
        a = _act(z, activation)
        # c_{i+1} = a @ wu + bu + f
        dwu.append(jnp.dot(a.T, dc))
        dbu.append(jnp.sum(dc, axis=0))
        da = jnp.dot(dc, wu[i].astype(f32).T)
        dz = _act_grad(z, activation)(da)[0]
        dwd.append(jnp.dot(f.T, dz))
        dbd.append(jnp.sum(dz, axis=0))
        df = jnp.dot(dz, wd[i].astype(f32).T) + dc
        if gated:
            dtaps.append(g * df)
            dgate = jnp.sum(df * (t_i - c_i)) * g * (1.0 - g) \
                / GATE_TEMPERATURE
            dgates.append(dgate)
            dc = (1.0 - g) * df
        else:
            dtaps.append(df)
            dgates.append(jnp.float32(0.0))
            dc = df
    stack = lambda xs: jnp.stack(xs[::-1], axis=0)
    return (
        stack(dgates).reshape(gates.shape).astype(gates.dtype),
        jnp.stack(dtaps[::-1], axis=1).astype(taps.dtype),
        stack(dwd).astype(wd.dtype),
        stack(dbd).astype(bd.dtype),
        stack(dwu).astype(wu.dtype),
        stack(dbu).astype(bu.dtype),
        dc.astype(dc_out.dtype),
    )


fused_cascade.defvjp(_fwd, _bwd)


def reference_cascade(gates, taps, wd, bd, wu, bu, c0, activation="RELU",
                      gated=True, unroll_limit: int = 8):
    """XLA-path implementation of the cascade over stacked weights.

    Small K (every shipped config uses K<=7) unrolls - measured 0.126 s vs
    0.182 s Scientific epoch on v5e because XLA pipelines the unrolled
    per-step matmuls across scan iterations; large K uses ``lax.scan`` to
    keep the HLO (and compile time) bounded."""

    dtype = c0.dtype
    k = taps.shape[1]
    if k <= unroll_limit:
        c = c0
        for i in range(k):
            if gated:
                g = jax.nn.sigmoid(gates[i] / GATE_TEMPERATURE)
                f = (g * taps[:, i, :].astype(jnp.float32)
                     + (1.0 - g) * c.astype(jnp.float32)).astype(dtype)
            else:
                f = taps[:, i, :] + c
            z = jnp.dot(f, wd[i], preferred_element_type=jnp.float32) + bd[i]
            a = _act(z, activation).astype(dtype)
            c = (jnp.dot(a, wu[i], preferred_element_type=jnp.float32)
                 + bu[i]).astype(dtype) + f
        return c

    def step(c, xs):
        g_i, tap, wd_i, bd_i, wu_i, bu_i = xs
        if gated:
            g = jax.nn.sigmoid(g_i / GATE_TEMPERATURE)
            f = (g * tap.astype(jnp.float32)
                 + (1.0 - g) * c.astype(jnp.float32)).astype(dtype)
        else:
            f = tap + c
        z = jnp.dot(f, wd_i, preferred_element_type=jnp.float32) + bd_i
        a = _act(z, activation).astype(dtype)
        c = (jnp.dot(a, wu_i, preferred_element_type=jnp.float32)
             + bu_i).astype(dtype) + f
        return c, None

    xs = (gates.astype(jnp.float32), taps.transpose(1, 0, 2), wd, bd, wu, bu)
    c, _ = jax.lax.scan(step, c0, xs)
    return c


def multi_reference_cascade(coef_a, coef_b, taps, wd, bd, wu, bu, c0,
                            activation="RELU", unroll_limit: int = 8):
    """S branch cascades as ONE unrolled loop of batched matmuls.

    The cached step is latency-bound op soup (~465 HLO ops/step), so at
    the symmetric base geometry (same K, D, R on every branch —
    Code_Cached/scripts/run_IISAN.py:27-49) running the branch cascades
    as (S, ...)-batched dot_generals divides the cascade's op count by S
    without changing a single float: each branch still sees exactly its
    own coefficients/weights/taps.

    The per-step fusion is generalized to ``f_i = a_i * tap_i + b_i * c``:
    the gated intra recurrence uses (a, b) = (sigmoid(g/T), 1-sigmoid),
    additive intra fusion uses (1, 1), and the inter branch uses (1, 1)
    over pre-fused taps (its own gating mixes cv/text inside the tap,
    model.py:335-338) — all three reference recurrences are this form.

    Shapes: coef_a/coef_b (S, K) fp32; taps (S, N, K, D); wd (S, K, D, R);
    bd (S, K, R); wu (S, K, R, D); bu (S, K, D); c0 (S, N, D).
    Returns (S, N, D) final carries.
    """
    dtype = c0.dtype
    k = taps.shape[2]
    batch_mm = lambda a, b: jax.lax.dot_general(
        a, b, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)

    def body(c, xs):
        a_i, b_i, tap_i, wd_i, bd_i, wu_i, bu_i = xs
        f = (a_i[:, None, None] * tap_i.astype(jnp.float32)
             + b_i[:, None, None] * c.astype(jnp.float32)).astype(dtype)
        z = batch_mm(f, wd_i) + bd_i[:, None, :]
        a = _act(z, activation).astype(dtype)
        return (batch_mm(a, wu_i) + bu_i[:, None, :]).astype(dtype) + f

    if k <= unroll_limit:
        c = c0
        for i in range(k):
            c = body(c, (coef_a[:, i], coef_b[:, i], taps[:, :, i, :],
                         wd[:, i], bd[:, i], wu[:, i], bu[:, i]))
        return c

    # Large K (Versa-style tap lists): lax.scan along K bounds HLO size and
    # compile time, matching reference_cascade's fallback above.
    xs = (coef_a.T, coef_b.T, taps.transpose(2, 0, 1, 3),
          wd.transpose(1, 0, 2, 3), bd.transpose(1, 0, 2),
          wu.transpose(1, 0, 2, 3), bu.transpose(1, 0, 2))
    c, _ = jax.lax.scan(lambda c, x: (body(c, x), None), c0, xs)
    return c


def cascade_coefs(gates, gated: bool):
    """(K,) gate params -> per-step (a, b) fusion coefficients (fp32)."""
    if gated:
        g = jax.nn.sigmoid(gates.astype(jnp.float32) / GATE_TEMPERATURE)
        return g, 1.0 - g
    k = gates.shape[0]
    return jnp.ones((k,), jnp.float32), jnp.ones((k,), jnp.float32)


def dual_reference_cascade(gates2, taps2, wd2, bd2, wu2, bu2, c02,
                           activation="RELU", gated=True):
    """Two-branch wrapper over multi_reference_cascade (text + cv intra)."""
    a0, b0 = cascade_coefs(gates2[0], gated)
    a1, b1 = cascade_coefs(gates2[1], gated)
    return multi_reference_cascade(
        jnp.stack([a0, a1]), jnp.stack([b0, b1]),
        taps2, wd2, bd2, wu2, bu2, c02, activation=activation)
