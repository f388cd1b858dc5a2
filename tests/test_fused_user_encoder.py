"""Fused SASRec user-encoder kernel tests (ops/fused_user_encoder.py).

Runs the Pallas kernels in interpreter mode on the CPU test platform and
validates them against the module path (models/modules.py), which is itself
torch-parity-tested in test_reference_parity.py.

Gradient comparisons use a LINEAR probe loss (sum(out * random_proj)): with
squared/cancelling losses, the per-element gradients of this post-LN network
are tiny differences of large terms, and any two float implementations
disagree by tens of percent from rounding alone (verified during
development: module-vs-module-variant disagrees as much as module-vs-kernel).
Under a linear probe all paths agree to ~1e-6 in f32.
"""

from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from iisan_tpu.models.user_encoder import UserEncoder, causal_additive_mask
from iisan_tpu.ops import fused_user_encoder as fue

requires_tpu = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="pltpu.prng_* has no interpreter rule; needs a real TPU")

cpu_only = pytest.mark.skipif(
    jax.default_backend() == "tpu",
    reason="tight-tolerance interpret-mode parity is defined on the CPU "
           "tier; TPU default matmul precision (bf16 passes) breaks 1e-5 "
           "tolerances - the compiled-TPU parity test below covers TPU")


@pytest.fixture()
def interpret_pallas():
    """Force pallas_call into interpreter mode (CPU-runnable kernels)."""
    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    with mock.patch.object(pl, "pallas_call", patched):
        yield


def _enc(L=10, H=2, NL=2, dtype=jnp.float32, fused=False):
    return UserEncoder(max_seq_len=L, num_attention_heads=H, n_layers=NL,
                       dropout=0.0, dtype=dtype, fused=fused)


def _setup(B=16, L=10, D=64, H=2, NL=2, masked=True, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((B, L, D)).astype(np.float32) * 0.5
    if masked:
        log_mask = (rng.random((B, L)) > 0.2).astype(np.float32)
        log_mask[:, -1] = 1.0
    else:
        log_mask = np.ones((B, L), np.float32)
    enc = _enc(L, H, NL)
    v = enc.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x),
                 jnp.asarray(log_mask))
    params = v["params"]["transformer_encoder"]
    return enc, params, jnp.asarray(x), jnp.asarray(log_mask)


def _fused(params, x, log_mask, NL, H, rate=0.0, rng=None, dtype="float32"):
    return fue.apply_fused_encoder(
        params, x, causal_additive_mask(log_mask),
        n_layers=NL, n_heads=H, drop_rate=rate, dropout_rng=rng,
        compute_dtype=dtype)


@cpu_only
def test_forward_matches_module(interpret_pallas):
    enc, params, x, log_mask = _setup()
    want = enc.apply({"params": {"transformer_encoder": params}}, x, log_mask,
                     deterministic=True)
    got = _fused(params, x, log_mask, NL=2, H=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@cpu_only
def test_forward_matches_module_bf16(interpret_pallas):
    enc, params, x, log_mask = _setup()
    enc16 = _enc(dtype=jnp.bfloat16)
    want = enc16.apply({"params": {"transformer_encoder": params}},
                       x.astype(jnp.bfloat16), log_mask, deterministic=True)
    got = _fused(params, x.astype(jnp.bfloat16), log_mask, NL=2, H=2,
                 dtype="bfloat16")
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=0.05, atol=0.05)


@cpu_only
@pytest.mark.parametrize("NL,masked", [(1, False), (2, True)])
def test_gradients_match_module(interpret_pallas, NL, masked):
    """Linear-probe gradients: kernel VJP == module autodiff (f32)."""
    enc, params, x, log_mask = _setup(NL=NL, masked=masked)
    rng = np.random.default_rng(1)
    proj = jnp.asarray(rng.standard_normal(x.shape).astype(np.float32))

    def loss_fused(p, xx):
        return jnp.sum(_fused(p, xx, log_mask, NL=NL, H=2) * proj)

    def loss_mod(p, xx):
        y = _enc(NL=NL).apply(
            {"params": {"transformer_encoder": p}}, xx, log_mask,
            deterministic=True)
        return jnp.sum(y * proj)

    g_f = jax.grad(loss_fused)(params, x)
    g_m = jax.grad(loss_mod)(params, x)
    flat_f = jax.tree_util.tree_leaves_with_path(g_f)
    flat_m = dict(jax.tree_util.tree_leaves_with_path(g_m))
    for path, a in flat_f:
        b = flat_m[path]
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5,
            err_msg=jax.tree_util.keystr(path))

    gx_f = jax.grad(lambda xx: loss_fused(params, xx))(x)
    gx_m = jax.grad(lambda xx: loss_mod(params, xx))(x)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_m),
                               rtol=5e-4, atol=5e-5)


@requires_tpu
def test_dropout_determinism_and_rate():
    _, params, x, log_mask = _setup(masked=False)
    key = jax.random.PRNGKey(7)
    y1 = np.asarray(_fused(params, x, log_mask, NL=2, H=2, rate=0.3, rng=key))
    y2 = np.asarray(_fused(params, x, log_mask, NL=2, H=2, rate=0.3, rng=key))
    y3 = np.asarray(_fused(params, x, log_mask, NL=2, H=2, rate=0.3,
                           rng=jax.random.PRNGKey(8)))
    assert np.array_equal(y1, y2), "same seed must reproduce"
    assert not np.array_equal(y1, y3), "different seeds must differ"
    y0 = np.asarray(_fused(params, x, log_mask, NL=2, H=2))
    assert not np.array_equal(y1, y0), "dropout must change the output"


@requires_tpu
def test_dropout_mask_statistics():
    """The in-kernel PRNG keep-rate must match the requested dropout rate."""
    rate = 0.25
    _, params, x, log_mask = _setup(masked=False)
    # Identity-ish probe: the input dropout mask zeros rows of the first
    # block's input; measure the keep fraction via the uniform helper
    # directly inside a trivial kernel.
    from jax.experimental.pallas import tpu as pltpu

    def kern(seed_ref, o_ref):
        pltpu.prng_seed(seed_ref[0])
        o_ref[...] = fue._dropout_mask((256, 256), rate)

    out = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((256, 256), jnp.float32),
    )(jnp.asarray([3], jnp.int32))
    vals = np.asarray(out)
    keep = (vals > 0).mean()
    assert abs(keep - (1 - rate)) < 0.02
    np.testing.assert_allclose(vals[vals > 0], 1.0 / (1 - rate), rtol=1e-6)


@requires_tpu
def test_dropout_bwd_uses_same_mask():
    """d/dx of a fixed-seed dropout forward: FD along a direction agrees,
    proving the recomputed backward masks equal the forward masks.

    The probe loss is linear (sum(out * proj)): a squared loss of the final
    LayerNorm output is constant (sum(y^2) == B*L*D for unit scale) and
    would make both sides trivially ~0.  FD also needs full-f32 matmuls:
    the TPU default (bf16 passes) adds ~1e-3-relative noise to the loss,
    swamping the O(eps) numerator.
    """
    _, params, x, log_mask = _setup(B=8, masked=False)
    key = jax.random.PRNGKey(5)
    rng = np.random.default_rng(2)
    proj = jnp.asarray(rng.standard_normal(x.shape).astype(np.float32))

    with jax.default_matmul_precision("highest"):
        def loss(xx):
            return jnp.sum(_fused(params, xx, log_mask, NL=2, H=2,
                                  rate=0.4, rng=key) * proj)

        g = jax.grad(loss)(x)
        v = jnp.asarray(rng.standard_normal(x.shape).astype(np.float32))
        v = v / jnp.sqrt(jnp.sum(v * v))
        eps = 1e-2
        fd = (float(loss(x + eps * v)) - float(loss(x - eps * v))) / (2 * eps)
        analytic = float(jnp.sum(g * v))
    assert abs(fd - analytic) / (abs(fd) + abs(analytic) + 1e-6) < 5e-2, \
        (fd, analytic)


def test_supported_shapes():
    assert fue.supported(64, 10, 64, 2)
    assert fue.supported(256, 10, 64, 2)
    assert fue.supported(32, 10, 64, 2)   # single-block grid
    assert not fue.supported(100, 10, 64, 2)  # not divisible by block
    assert not fue.supported(4, 10, 64, 2)    # too small
    assert not fue.supported(64, 10, 63, 2)   # D % H != 0


def test_param_flatten_roundtrip():
    _, params, _, _ = _setup()
    flat = fue.flatten_encoder_params(params, 2)
    tree = fue.unflatten_encoder_grads(flat, 2)
    orig = jax.tree_util.tree_leaves_with_path(params)
    new = dict(jax.tree_util.tree_leaves_with_path(tree))
    assert len(orig) == len(new) == len(flat)
    for path, a in orig:
        assert np.array_equal(np.asarray(a), np.asarray(new[path]))


@cpu_only
def test_module_fallback_off_tpu():
    """On the CPU test platform, auto mode must take the module path and
    produce identical results to fused=False."""
    enc, params, x, log_mask = _setup()
    auto = _enc(fused=None)
    off = _enc(fused=False)
    y1 = auto.apply({"params": {"transformer_encoder": params}}, x, log_mask,
                    deterministic=True)
    y2 = off.apply({"params": {"transformer_encoder": params}}, x, log_mask,
                   deterministic=True)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


@requires_tpu
def test_tpu_compiled_parity():
    """Compiled kernels on the real chip: fwd and linear-probe grads match
    the XLA module path (both at the platform's native precision)."""
    enc, params, x, log_mask = _setup(B=32, masked=True)
    rng = np.random.default_rng(3)
    proj = jnp.asarray(rng.standard_normal(x.shape).astype(np.float32))

    def loss_fused(p, xx):
        return jnp.sum(_fused(p, xx, log_mask, NL=2, H=2) * proj)

    def loss_mod(p, xx):
        y = enc.apply({"params": {"transformer_encoder": p}}, xx, log_mask,
                      deterministic=True)
        return jnp.sum(y * proj)

    f = float(loss_fused(params, x))
    m = float(loss_mod(params, x))
    assert abs(f - m) / (abs(m) + 1e-6) < 5e-3, (f, m)

    g_f = jax.grad(loss_fused)(params, x)
    g_m = jax.grad(loss_mod)(params, x)
    flat_m = dict(jax.tree_util.tree_leaves_with_path(g_m))
    for path, a in jax.tree_util.tree_leaves_with_path(g_f):
        b = flat_m[path]
        scale = np.abs(np.asarray(b)).max() + 1e-6
        rel = np.abs(np.asarray(a) - np.asarray(b)).max() / scale
        assert rel < 2e-2, (jax.tree_util.keystr(path), rel)
