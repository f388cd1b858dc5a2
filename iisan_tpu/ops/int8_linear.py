"""Int8 (W8A8) linear layers for the frozen uncached towers.

TPU-native extension (no reference analog — the reference runs its frozen
towers in fp16 autocast, /root/reference/Code_Uncached/run.py:380-385).
The IISAN towers are *frozen* (run.py:79-100): their matmuls are pure
inference inside the train step, which makes them eligible for int8
execution on the MXU.  v5e multiplies int8 at 2x the bf16 rate (measured
on this chip: 369.8 TOPS int8 vs 191.9 TFLOPS bf16, 4096^2 chained
matmuls), and the uncached floor analysis (UNCACHED_FLOOR.json) attributes
~93% of the step to the frozen tower forwards — so W8A8 towers attack the
dominant cost directly.

Scheme (standard symmetric dynamic quantization):
  * weights: per-output-channel absmax int8, quantized ONCE (host side,
    at graft/import time — frozen weights never change, so the scales are
    static and the fp32 originals never reach HBM);
  * activations: per-token (row) absmax int8, computed on the fly in the
    step (a fused VPU reduction + cast on the activation tile);
  * matmul: lax.dot_general int8 x int8 -> int32 on the MXU;
  * dequant: one f32 multiply by (row_scale x col_scale), + bias, cast to
    the compute dtype — fuses into the consumer under XLA.

Error bound: per-row symmetric absmax quantization has RMS relative error
~= 1/(127*sqrt(3)) ~ 0.45% per operand, ~0.7% per product — of the same
order as the bf16 activation noise (bf16 has ~0.4% ULP) the towers
already run in.  The SAN trains *on* the int8 taps, so the adapter
absorbs the static part of the error; the A/B artifact
(INT8_TOWER_AB.json) measures the end metric effect.

Only sensible when gradients stop at the tap boundary: ``jnp.rint`` has a
zero-derivative JVP, so differentiating *through* an Int8Dense silently
zeroes upstream gradients.  config.validate() therefore requires
``towers_frozen()`` for ``tower_quant='int8'``.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# Uniform int8 in [-127, 127] has std 127/sqrt(3); kscale init divides it
# back out so a freshly initialized (ungrafted) Int8Dense matches
# nn.Dense's lecun-normal variance — tests and random-weight proxies see
# statistically equivalent towers.
_INT8_UNIFORM_STD = 127.0 / np.sqrt(3.0)


def quantize_kernel(kernel) -> tuple:
    """Per-output-channel symmetric absmax quantization of a (in, out)
    dense kernel.  Returns (kernel_q int8 (in, out), kscale f32 (out,)).

    Host-side numpy: called once at weight-import/graft time."""
    k = np.asarray(kernel, dtype=np.float32)
    absmax = np.max(np.abs(k), axis=0)                      # (out,)
    scale = (absmax / 127.0).astype(np.float32)
    inv = np.where(scale > 0, 1.0 / np.where(scale > 0, scale, 1.0), 0.0)
    q = np.clip(np.rint(k * inv), -127, 127).astype(np.int8)
    return q, scale


def int8_matmul(x, kernel_q, kscale, bias: Optional[Any], out_dtype):
    """y = dequant(quant_per_row(x) @ kernel_q) + bias.

    x: (..., in) float; kernel_q: (in, out) int8; kscale: (out,) f32.
    The contraction runs int8 x int8 -> int32 on the MXU; everything else
    is elementwise and fuses.  This XLA formulation is the default int8
    impl: measured on a 12-layer dense tower stack at the uncached ViT
    geometry (M=69632) it runs 199.6 effective TFLOPs vs bf16's 177.9 —
    XLA pipelines the quantize/dequant into its matmul fusions better
    than the hand-written kernel (ops/int8_pallas.py, 127.6 — demoted to
    a documented negative result after the round-4 K/N sweep,
    INT8_IMPL_BENCH.json)."""
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)   # (..., 1)
    sx = absmax / 127.0
    inv = jnp.where(sx > 0, 1.0 / jnp.where(sx > 0, sx, 1.0), 0.0)
    xq = jnp.clip(jnp.rint(xf * inv), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(
        xq, kernel_q,
        dimension_numbers=(((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * (sx * kscale.astype(jnp.float32))
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


class Int8Dense(nn.Module):
    """Drop-in nn.Dense replacement holding int8 weights + per-channel
    scales.  Param tree: {kernel_q (in, out) int8, kscale (out,) f32,
    bias (out,) f32} — produced from float weights by
    ``quantize_dense_tree`` (graft path) or initialized random-int8 with
    lecun-matched scales (test path).

    impl: 'xla' (default, fastest measured — see int8_matmul) or
    'pallas' (the fused one-pass kernel — a documented negative result,
    kept for direct benchmarking/tests only; falls back to XLA when the
    geometry is unsupported or the backend is not TPU)."""

    features: int
    dtype: Any = jnp.bfloat16
    use_bias: bool = True
    impl: str = "xla"

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]

        def q_init(rng, shape):
            return jax.random.randint(rng, shape, -127, 128, jnp.int8)

        def s_init(rng, shape):
            lecun_std = 1.0 / np.sqrt(in_dim)
            return jnp.full(shape, lecun_std / _INT8_UNIFORM_STD, jnp.float32)

        kernel_q = self.param("kernel_q", q_init, (in_dim, self.features))
        kscale = self.param("kscale", s_init, (self.features,))
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,)) if self.use_bias else None
        if self.impl == "pallas" and jax.default_backend() == "tpu":
            from .int8_pallas import fused_w8a8_matmul, supported

            if supported(in_dim, self.features,
                         jnp.dtype(x.dtype).itemsize,
                         jnp.dtype(self.dtype).itemsize):
                return fused_w8a8_matmul(x, kernel_q, kscale, bias,
                                         self.dtype)
        return int8_matmul(x, kernel_q, kscale, bias, self.dtype)


def dense_or_int8(features: int, dtype, name: str, quant: str = "none"):
    """Tower dense factory: the tower modules route every quantizable
    matmul through this, so one flag flips the whole tower.  quant:
    'none' | 'int8' (XLA impl; the Pallas kernel was measured slower at
    every tower geometry and demoted — Int8Dense(impl='pallas') remains
    for direct benchmarking, scripts/bench_int8_impls.py)."""
    if quant == "int8":
        return Int8Dense(features, dtype=dtype, name=name, impl="xla")
    if quant != "none":
        # Reject loudly: 'int8_pallas' was a accepted value before its
        # round-4 demotion, and a silent nn.Dense fallback would change
        # the param tree ({kernel,bias} vs {kernel_q,kscale,bias}) and
        # the memory/perf profile without any error.
        raise ValueError(
            f"unknown tower quant {quant!r}: expected 'none' or 'int8' "
            "(the 'int8_pallas' kernel was demoted to a benchmark-only "
            "path, Int8Dense(impl='pallas') - INT8_IMPL_BENCH.json)")
    return nn.Dense(features, dtype=dtype, name=name)


def quantize_dense_tree(tree):
    """Rewrite every {kernel, bias} / {kernel} dense-param dict in a float
    tower tree into Int8Dense's {kernel_q, kscale, bias} — the graft-time
    conversion for ``tower_quant='int8'``.  Leaves every other node
    (embeddings, layernorms, bare arrays) untouched."""
    if not isinstance(tree, dict):
        return tree
    keys = set(tree.keys())
    if "kernel" in keys and keys <= {"kernel", "bias"} \
            and getattr(tree["kernel"], "ndim", 0) == 2:
        q, s = quantize_kernel(tree["kernel"])
        out = {"kernel_q": jnp.asarray(q), "kscale": jnp.asarray(s)}
        if "bias" in tree:
            out["bias"] = jnp.asarray(np.asarray(tree["bias"], np.float32))
        return out
    return {k: quantize_dense_tree(v) for k, v in tree.items()}
