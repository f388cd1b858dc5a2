"""Fused attention-subblock kernel tests (ops/fused_attn_subblock.py).

Interpret-mode parity on the CPU tier; a compiled parity test on the TPU
tier (IISAN_TEST_PLATFORM=tpu).  The ground truth for both is the
identical-math XLA formulation ``_reference_subblock``, which is itself
asserted against the composed module-path math (qkv Dense -> MHA -> out
Dense) so the kernel is anchored to what models/vit.py actually computes.
"""

from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from iisan_tpu.ops import fused_attn_subblock as fs
from iisan_tpu.ops import fused_attention as fa

cpu_only = pytest.mark.skipif(
    jax.default_backend() == "tpu",
    reason="interpret-mode tolerances are defined on the CPU tier")
requires_tpu = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="needs the real TPU")


@pytest.fixture()
def interpret_pallas():
    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    with mock.patch.object(pl, "pallas_call", patched):
        yield


def _inputs(B=6, T=17, D=32, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((B, T, D)) * 0.3, jnp.float32)
    wqkv = jnp.asarray(rng.standard_normal((D, 3 * D)) / np.sqrt(D),
                       jnp.float32)
    bqkv = jnp.asarray(rng.standard_normal((3 * D,)) * 0.01, jnp.float32)
    wo = jnp.asarray(rng.standard_normal((D, D)) / np.sqrt(D), jnp.float32)
    bo = jnp.asarray(rng.standard_normal((D,)) * 0.01, jnp.float32)
    return x, wqkv, bqkv, wo, bo


def test_reference_matches_composed_module_math():
    """_reference_subblock == qkv split + fused_attention reference +
    out projection — the exact op sequence of models/vit.py's
    ViTSelfAttention + attention_output Dense."""
    x, wqkv, bqkv, wo, bo = _inputs()
    D = x.shape[-1]
    want_q = x @ wqkv[:, :D] + bqkv[:D]
    want_k = x @ wqkv[:, D:2 * D] + bqkv[D:2 * D]
    want_v = x @ wqkv[:, 2 * D:] + bqkv[2 * D:]
    ctx = fa._reference_mha(want_q.astype(jnp.float32),
                            want_k.astype(jnp.float32),
                            want_v.astype(jnp.float32), None, 2,
                            jnp.float32)
    want = ctx @ wo + bo
    got = fs._reference_subblock(x, wqkv, bqkv, wo, bo, None, 2,
                                 jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@cpu_only
@pytest.mark.parametrize("with_bias", [False, True])
def test_forward_matches_reference(interpret_pallas, with_bias):
    x, wqkv, bqkv, wo, bo = _inputs()
    B, T, D = x.shape
    bias = None
    if with_bias:
        rng = np.random.default_rng(1)
        bias = jnp.where(jnp.asarray(rng.random((B, T))) > 0.3, 0.0, -1e9)
    got = fs.fused_attn_subblock(x, wqkv, bqkv, wo, bo, n_heads=2,
                                 key_bias=bias)
    want = fs._reference_subblock(x, wqkv, bqkv, wo, bo, bias, 2,
                                  jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@cpu_only
def test_gradients_flow_through_vjp(interpret_pallas):
    """The custom VJP is the autodiff of the reference formulation —
    for x AND all four weight/bias operands."""
    x, wqkv, bqkv, wo, bo = _inputs()

    def loss_fused(*args):
        return jnp.sum(fs.fused_attn_subblock(*args, n_heads=2) ** 2)

    def loss_ref(*args):
        return jnp.sum(fs._reference_subblock(*args, None, 2,
                                              jnp.float32) ** 2)

    got = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, wqkv, bqkv,
                                                        wo, bo)
    want = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, wqkv, bqkv,
                                                       wo, bo)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-4, atol=1e-4)


@cpu_only
def test_unsupported_geometry_falls_back_to_xla():
    # dk % 8 != 0 -> supported() False -> identical XLA path, no kernel
    x, wqkv, bqkv, wo, bo = _inputs(D=36)
    got = fs.fused_attn_subblock(x, wqkv, bqkv, wo, bo, n_heads=2)
    want = fs._reference_subblock(x, wqkv, bqkv, wo, bo, None, 2,
                                  jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    assert not fs.supported(*x.shape, 2, 4)


@requires_tpu
def test_compiled_parity_on_tpu():
    """bf16 compiled kernel vs the XLA reference at a real-ish geometry
    (tolerances follow test_fused_attention's TPU tier)."""
    rng = np.random.default_rng(0)
    B, T, D, H = 8, 197, 768, 12
    x = jnp.asarray(rng.standard_normal((B, T, D)) * 0.3, jnp.bfloat16)
    wqkv = jnp.asarray(rng.standard_normal((D, 3 * D)) / np.sqrt(D),
                       jnp.bfloat16)
    bqkv = jnp.asarray(rng.standard_normal((3 * D,)) * 0.01, jnp.bfloat16)
    wo = jnp.asarray(rng.standard_normal((D, D)) / np.sqrt(D),
                     jnp.bfloat16)
    bo = jnp.asarray(rng.standard_normal((D,)) * 0.01, jnp.bfloat16)
    assert fs.supported(B, T, D, H, 2)
    got = np.asarray(jax.jit(lambda *a: fs.fused_attn_subblock(
        *a, n_heads=H))(x, wqkv, bqkv, wo, bo), np.float32)
    want = np.asarray(fs._reference_subblock(
        x, wqkv, bqkv, wo, bo, None, H, jnp.bfloat16), np.float32)
    scale = np.abs(want).max()
    assert np.abs(got - want).max() / scale < 0.02
