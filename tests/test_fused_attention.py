"""Fused encoder MHA kernel tests (ops/fused_attention.py).

Interpret-mode on the CPU tier; a compiled test on the TPU tier
(IISAN_TEST_PLATFORM=tpu).
"""

from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

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


def _qkv(B=6, T=17, D=32, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    return mk(), mk(), mk()


@cpu_only
@pytest.mark.parametrize("with_bias", [False, True])
def test_forward_matches_reference(interpret_pallas, with_bias):
    q, k, v = _qkv()
    B, T, D = q.shape
    bias = None
    if with_bias:
        rng = np.random.default_rng(1)
        bias = jnp.where(jnp.asarray(rng.random((B, T))) > 0.3, 0.0, -1e9)
    got = fa.fused_mha(q, k, v, n_heads=2, key_bias=bias)
    want = fa._reference_mha(q, k, v, bias, 2, jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@cpu_only
def test_gradients_flow_through_vjp(interpret_pallas):
    """The custom VJP is the autodiff of the reference formulation."""
    q, k, v = _qkv()
    rng = np.random.default_rng(2)
    proj = jnp.asarray(rng.standard_normal(q.shape), jnp.float32)

    def loss_fused(q, k, v):
        return jnp.sum(fa.fused_mha(q, k, v, n_heads=2) * proj)

    def loss_ref(q, k, v):
        return jnp.sum(fa._reference_mha(q, k, v, None, 2, jnp.float32) * proj)

    g_f = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_supported():
    assert fa.supported(352, 197, 768, 12)
    assert fa.supported(1, 30, 768, 12)
    assert not fa.supported(4, 30, 768, 5)   # D % H != 0
    assert not fa.supported(4, 30, 36, 6)    # head dim 6 not multiple of 8


def test_module_fallback_paths():
    """ViTSelfAttention: fused flag off-TPU / with dropout must match the
    plain module math exactly (the fused branch is not taken)."""
    from iisan_tpu.models.vit import ViTSelfAttention

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 17, 32)), jnp.float32)
    on = ViTSelfAttention(num_heads=2, dtype=jnp.float32, fused=True)
    off = ViTSelfAttention(num_heads=2, dtype=jnp.float32, fused=False)
    p = on.init(jax.random.PRNGKey(0), x)["params"]
    if jax.default_backend() == "tpu":
        pytest.skip("fused branch active on TPU; parity covered below")
    y_on = on.apply({"params": p}, x)
    y_off = off.apply({"params": p}, x)
    np.testing.assert_array_equal(np.asarray(y_on), np.asarray(y_off))


@requires_tpu
def test_tpu_compiled_parity():
    """Compiled kernel vs XLA reference at the ViT-base training geometry
    (a reduced batch to keep the test fast)."""
    rng = np.random.default_rng(0)
    B, T, D, H = 16, 197, 768, 12
    mk = lambda: jnp.asarray(rng.standard_normal((B, T, D)) * 0.3,
                             jnp.bfloat16)
    q, k, v = mk(), mk(), mk()
    got = np.asarray(fa.fused_mha(q, k, v, n_heads=H), np.float32)
    want = np.asarray(fa._reference_mha(q, k, v, None, H, jnp.bfloat16),
                      np.float32)
    scale = np.abs(want).max()
    assert np.abs(got - want).max() / scale < 0.05, np.abs(got - want).max()


@requires_tpu
def test_tpu_dropout_determinism_and_effect():
    """In-kernel attention dropout: same seed reproduces, different seeds
    differ, rate=0.3 changes the output vs deterministic."""
    rng = np.random.default_rng(0)
    B, T, D, H = 8, 30, 64, 2
    mk = lambda: jnp.asarray(rng.standard_normal((B, T, D)) * 0.5,
                             jnp.float32)
    q, k, v = mk(), mk(), mk()
    k1, k2 = jax.random.PRNGKey(1), jax.random.PRNGKey(2)
    y1 = np.asarray(fa.fused_mha(q, k, v, H, drop_rate=0.3, dropout_rng=k1))
    y1b = np.asarray(fa.fused_mha(q, k, v, H, drop_rate=0.3, dropout_rng=k1))
    y2 = np.asarray(fa.fused_mha(q, k, v, H, drop_rate=0.3, dropout_rng=k2))
    y0 = np.asarray(fa.fused_mha(q, k, v, H))
    assert np.array_equal(y1, y1b)
    assert not np.array_equal(y1, y2)
    assert not np.array_equal(y1, y0)


@requires_tpu
def test_tpu_uncached_loss_parity_with_kernels():
    """One uncached train-loss evaluation: all fused paths on vs all off
    must agree within bf16 tolerance (regression net for the kernel
    integrations; deterministic=True so dropout streams don't differ)."""
    import dataclasses

    from iisan_tpu.config import IISANConfig
    from iisan_tpu.data.synthetic import synthetic_corpus
    from iisan_tpu.train.uncached import build_uncached_model

    base = IISANConfig(
        pipeline="uncached", batch_size=8, embedding_dim=64,
        adapter_type="IISAN", adding_adapter_to="all",
        side_adapter_vit_list="1,3,5,7,9,11",
        side_adapter_bert_list="1,3,5,7,9,11", modality="intra_inter",
        text_layers=2, image_layers=2, seed=1).with_bert_dims()
    corpus = synthetic_corpus(n_users=32, item_num=100, seed=0)
    rng = np.random.default_rng(0)
    bs, L = base.batch_size, base.max_seq_len
    ids = jnp.asarray(corpus.train_seqs[:bs])
    mask = jnp.asarray(corpus.train_log_mask[:bs])
    tokens = np.zeros((bs * (L + 1), 60), np.int32)
    tokens[:, :30] = rng.integers(1, 1000, size=(bs * (L + 1), 30))
    tokens[:, 30:] = 1
    images = jnp.asarray(
        rng.standard_normal((bs * (L + 1), 224, 224, 3)) * 0.3, jnp.bfloat16)
    pop = jnp.ones((101,), jnp.float32) / 101.0

    losses = {}
    params = None
    for fused in (True, False):
        cfg = dataclasses.replace(base, fused_tower_attention=fused,
                                  fused_user_encoder=fused)
        model, _ = build_uncached_model(cfg)
        if params is None:
            params = model.init(
                {"params": jax.random.PRNGKey(0),
                 "dropout": jax.random.PRNGKey(1)},
                ids, images, jnp.asarray(tokens), mask, pop,
                deterministic=True)["params"]
        losses[fused] = float(model.apply(
            {"params": params}, ids, images, jnp.asarray(tokens), mask, pop,
            deterministic=True))
    assert abs(losses[True] - losses[False]) / abs(losses[False]) < 5e-3, \
        losses


def test_supported_rejects_vmem_overflow_geometry():
    """ADVICE r1: a T so large that even a block of one image overflows
    VMEM must be rejected by supported() (the caller then takes the XLA
    module path) instead of compiling an overflowing kernel."""
    assert fa._pick_batch_block(352, 197, 768) > 0   # ViT-base geometry
    assert fa._pick_batch_block(8, 20000, 768) == 0  # ~3 GB of scores
    assert fa.supported(352, 197, 768, 12)
    assert not fa.supported(8, 20000, 768, 8)


@cpu_only
def test_fused_mha_falls_back_on_unsupported_geometry():
    """fused_mha on an unsupported (huge-T) geometry routes to the
    identical-math XLA path rather than building a kernel."""
    B, T, D, H = 1, 4100, 64, 8
    assert not fa.supported(B, T, D, H)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    out = fa.fused_mha(q, k, v, H)
    want = fa._reference_mha(q, k, v, None, H, jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-5)


@requires_tpu
def test_tpu_bwd_with_key_bias():
    """Gradient through the fused kernel WITH a key bias (padding mask):
    the VJP residual is the kernel-shaped (B, 1, T) bias, which must be
    re-flattened before the XLA reference recompute (previously raised a
    rank error at trace time)."""
    rng = np.random.default_rng(3)
    B, T, D, H = 8, 24, 64, 4
    mk = lambda: jnp.asarray(rng.standard_normal((B, T, D)) * 0.3,
                             jnp.float32)
    q, k, v = mk(), mk(), mk()
    bias = np.zeros((B, T), np.float32)
    bias[:, -5:] = -1e9                       # padded key positions
    bias = jnp.asarray(bias)

    def f_fused(q_):
        return fa.fused_mha(q_, k, v, H, key_bias=bias).astype(
            jnp.float32).sum()

    def f_ref(q_):
        return fa._reference_mha(q_, k, v, bias, H, jnp.float32).astype(
            jnp.float32).sum()

    g_fused = np.asarray(jax.grad(f_fused)(q))
    g_ref = np.asarray(jax.grad(f_ref)(q))
    np.testing.assert_allclose(g_fused, g_ref, atol=2e-4)


def _reference_mha_masked(q, k, v, bias, n_heads, dt, masks):
    """Explicit-mask oracle mirroring the kernel's exact cast chain:
    softmax in f32 -> cast dt -> (f32 * mask) -> cast dt -> PV matmul.
    ``masks``: (B, H, Tq, Tk) scaled keep masks (f32), treated as
    constants — exactly how autodiff sees the kernel's on-chip draws."""
    import math

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
    pd = (p.astype(jnp.float32) * jax.lax.stop_gradient(masks)).astype(dt)
    o = jnp.einsum("bhqk,bhkd->bhqd", pd, vh,
                   preferred_element_type=jnp.float32).astype(dt)
    return o.transpose(0, 2, 1, 3).reshape(B, T, D)


@requires_tpu
def test_tpu_train_mode_grad_parity():
    """VERDICT r4 next #1: the train-mode (active attention dropout)
    backward.  The bwd kernel regenerates the fwd's on-chip masks by
    PRNG replay; the oracle extracts those masks with the debug replay
    kernel and applies them explicitly in XLA.  Forward parity proves
    replay == the fwd's actual draws; grad parity proves the hand-
    written backprop."""
    rng = np.random.default_rng(7)
    B, T, D, H, rate = 8, 24, 64, 4, 0.1
    mk = lambda: jnp.asarray(rng.standard_normal((B, T, D)) * 0.3,
                             jnp.float32)
    q, k, v = mk(), mk(), mk()
    bias = np.zeros((B, T), np.float32)
    bias[:, -5:] = -1e9
    bias = jnp.asarray(bias)
    key = jax.random.PRNGKey(11)
    seed = fa.derive_seed(key)
    masks = fa.replay_dropout_masks(seed, B, T, D, H, rate, itemsize=4)
    assert 0.85 < float((np.asarray(masks) > 0).mean()) < 0.95  # ~1-rate

    proj = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)

    def loss_fused(q_, k_, v_):
        y = fa.fused_mha(q_, k_, v_, H, key_bias=bias, drop_rate=rate,
                         dropout_rng=key)
        return jnp.sum(y.astype(jnp.float32) * proj)

    def loss_ref(q_, k_, v_):
        y = _reference_mha_masked(q_, k_, v_, bias, H, jnp.float32, masks)
        return jnp.sum(y.astype(jnp.float32) * proj)

    # forward parity (replayed masks ARE the fwd's masks)
    yf = np.asarray(fa.fused_mha(q, k, v, H, key_bias=bias, drop_rate=rate,
                                 dropout_rng=key))
    yr = np.asarray(_reference_mha_masked(q, k, v, bias, H, jnp.float32,
                                          masks))
    np.testing.assert_allclose(yf, yr, rtol=1e-4, atol=1e-4)

    g_f = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g_f, g_r):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max()
        assert np.abs(a - b).max() / scale < 2e-3, \
            (name, np.abs(a - b).max(), scale)


@requires_tpu
def test_tpu_train_mode_grad_bf16_vit_geometry():
    """Train-mode bwd kernel at the bf16 ViT-base tower geometry
    (reduced batch): compiles within VMEM, grads finite and match the
    explicit-mask oracle within bf16 tolerance."""
    rng = np.random.default_rng(3)
    B, T, D, H, rate = 8, 197, 768, 12, 0.1
    mk = lambda: jnp.asarray(rng.standard_normal((B, T, D)) * 0.2,
                             jnp.bfloat16)
    q, k, v = mk(), mk(), mk()
    key = jax.random.PRNGKey(3)
    seed = fa.derive_seed(key)
    masks = fa.replay_dropout_masks(seed, B, T, D, H, rate, itemsize=2)
    proj = jnp.asarray(rng.standard_normal((B, T, D)) * 0.1, jnp.float32)

    def loss_fused(q_, k_, v_):
        y = fa.fused_mha(q_, k_, v_, H, drop_rate=rate, dropout_rng=key)
        return jnp.sum(y.astype(jnp.float32) * proj)

    def loss_ref(q_, k_, v_):
        y = _reference_mha_masked(q_, k_, v_, None, H, jnp.bfloat16, masks)
        return jnp.sum(y.astype(jnp.float32) * proj)

    g_f = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g_f, g_r):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        assert np.all(np.isfinite(a)), name
        scale = np.abs(b).max()
        assert np.abs(a - b).max() / scale < 0.05, \
            (name, np.abs(a - b).max(), scale)
