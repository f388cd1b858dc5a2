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


# ---------------------------------------------------------------------------
# Model wiring: fused_attention="subblock" in ViTBlock / BertLayer keeps the
# module path's exact param tree (checkpoint / HF-import compatibility) and
# its numerics.  On this CPU tier the branch takes the identical-math XLA
# fallback; the kernel itself is covered by the interpret/TPU tests above.
# ---------------------------------------------------------------------------

def _tree_specs(tree):
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {jax.tree_util.keystr(p): v.shape for p, v in flat}


@cpu_only
def test_vit_subblock_wiring_tree_and_parity():
    from iisan_tpu.models.vit import ViTEncoder

    kw = dict(image_size=32, patch_size=16, hidden_dim=32, num_layers=2,
              num_heads=4, intermediate_dim=64, dtype=jnp.float32)
    img = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 32, 32, 3)),
        jnp.float32)
    mod = ViTEncoder(**kw, fused_attention=False)
    sub = ViTEncoder(**kw, fused_attention="subblock")
    p_mod = mod.init(jax.random.PRNGKey(0), img)
    p_sub = sub.init(jax.random.PRNGKey(0), img)
    assert _tree_specs(p_mod) == _tree_specs(p_sub)
    # identical param paths -> identical per-param init streams
    jax.tree_util.tree_map(np.testing.assert_array_equal, p_mod, p_sub)
    y_mod, h_mod = mod.apply(p_mod, img)
    # cross-apply: module-initialized checkpoint through the subblock path
    y_sub, h_sub = sub.apply(p_mod, img)
    np.testing.assert_allclose(y_sub, y_mod, rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(h_sub, h_mod, rtol=3e-5, atol=3e-5)


@cpu_only
def test_bert_subblock_wiring_tree_and_parity():
    from iisan_tpu.models.bert import BertEncoder

    kw = dict(vocab_size=97, hidden_dim=32, num_layers=2, num_heads=4,
              intermediate_dim=64, max_position=24, dtype=jnp.float32,
              dropout=0.0)
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(0, 97, (3, 12)), jnp.int32)
    mask = jnp.asarray((np.arange(12)[None, :] < [[12], [7], [9]]),
                       jnp.int32)  # padding -> exercises the key bias
    mod = BertEncoder(**kw, fused_attention=False)
    sub = BertEncoder(**kw, fused_attention="subblock")
    p_mod = mod.init(jax.random.PRNGKey(0), ids, mask)
    p_sub = sub.init(jax.random.PRNGKey(0), ids, mask)
    assert _tree_specs(p_mod) == _tree_specs(p_sub)
    jax.tree_util.tree_map(np.testing.assert_array_equal, p_mod, p_sub)
    y_mod, h_mod = mod.apply(p_mod, ids, mask)
    y_sub, h_sub = sub.apply(p_mod, ids, mask)
    np.testing.assert_allclose(y_sub, y_mod, rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(h_sub, h_mod, rtol=3e-5, atol=3e-5)


@cpu_only
def test_subblock_wiring_keeps_houlsby_and_falls_back_for_lora():
    """Houlsby adapters compose with the subblock branch (adapter sits
    after the fused out-proj); LoRA towers must keep the module path
    (q/v are LoRADense) - same tree as fused_attention=True."""
    from iisan_tpu.models.vit import ViTEncoder

    kw = dict(image_size=32, patch_size=16, hidden_dim=32, num_layers=1,
              num_heads=4, intermediate_dim=64, dtype=jnp.float32)
    img = jnp.zeros((1, 32, 32, 3), jnp.float32)
    for extra in ({"houlsby_down": 8}, {"lora_rank": 4}):
        mod = ViTEncoder(**kw, fused_attention=False, **extra)
        sub = ViTEncoder(**kw, fused_attention="subblock", **extra)
        p_mod = mod.init(jax.random.PRNGKey(0), img)
        p_sub = sub.init(jax.random.PRNGKey(0), img)
        assert _tree_specs(p_mod) == _tree_specs(p_sub), extra


@cpu_only
def test_subblock_init_with_train_args_does_not_raise():
    """Initializing with the same args as the train step (deterministic=
    False, dropout>0) must work: params do not depend on dropout
    (code-review r4 finding)."""
    from iisan_tpu.models.bert import BertEncoder

    enc = BertEncoder(vocab_size=50, hidden_dim=32, num_layers=1,
                      num_heads=4, intermediate_dim=64, max_position=16,
                      dtype=jnp.float32, dropout=0.1,
                      fused_attention="subblock")
    ids = jnp.ones((2, 8), jnp.int32)
    mask = jnp.ones((2, 8), jnp.int32)
    p = enc.init({"params": jax.random.PRNGKey(0),
                  "dropout": jax.random.PRNGKey(1)}, ids, mask,
                 deterministic=False)
    assert "params" in p


def test_unknown_quant_and_fused_values_raise():
    from iisan_tpu.config import IISANConfig
    from iisan_tpu.models.towers import towers_from_config
    from iisan_tpu.ops.int8_linear import dense_or_int8

    with pytest.raises(ValueError, match="unknown tower quant"):
        dense_or_int8(8, jnp.float32, "x", "int8_pallas")
    cfg = IISANConfig(adapter_type="IISAN", adding_adapter_to="all",
                      fine_tune_to="None",
                      fused_tower_attention="Subblock")
    with pytest.raises(ValueError, match="fused_tower_attention"):
        towers_from_config(cfg)


@cpu_only
def test_reference_subblock_dropout_semantics():
    """The off-TPU train-mode fallback: keep-and-rescale dropout on the
    attention probabilities — unbiased in expectation, ~rate of the
    post-softmax mass dropped, deterministic per key."""
    x, wqkv, bqkv, wo, bo = _inputs(B=4, T=16, D=32, seed=3)
    rate, key = 0.5, jax.random.PRNGKey(11)
    base = fs._reference_subblock(x, wqkv, bqkv, wo, bo, None, 4,
                                  jnp.float32)
    d1 = fs._reference_subblock(x, wqkv, bqkv, wo, bo, None, 4,
                                jnp.float32, drop_rate=rate,
                                dropout_rng=key)
    d2 = fs._reference_subblock(x, wqkv, bqkv, wo, bo, None, 4,
                                jnp.float32, drop_rate=rate,
                                dropout_rng=key)
    np.testing.assert_array_equal(d1, d2)  # deterministic per key
    assert not np.allclose(d1, base)       # masks actually applied
    # rate=0 or no rng -> exactly the deterministic path
    np.testing.assert_array_equal(
        fs._reference_subblock(x, wqkv, bqkv, wo, bo, None, 4,
                               jnp.float32, drop_rate=0.0,
                               dropout_rng=key), base)
    # many-key average approaches the deterministic output (unbiased)
    acc = np.zeros_like(np.asarray(base))
    n = 64
    for i in range(n):
        acc += np.asarray(fs._reference_subblock(
            x, wqkv, bqkv, wo, bo, None, 4, jnp.float32,
            drop_rate=rate, dropout_rng=jax.random.PRNGKey(100 + i)))
    np.testing.assert_allclose(acc / n, base, atol=0.15)


@cpu_only
def test_vit_subblock_train_mode_runs_off_tpu():
    """ViT with dropout>0, deterministic=False on CPU: the subblock
    branch must run (review r4: it used to raise)."""
    from iisan_tpu.models.vit import ViTEncoder

    enc = ViTEncoder(image_size=32, patch_size=16, hidden_dim=32,
                     num_layers=1, num_heads=4, intermediate_dim=64,
                     dtype=jnp.float32, dropout=0.1,
                     fused_attention="subblock")
    img = jnp.zeros((2, 32, 32, 3), jnp.float32)
    p = enc.init(jax.random.PRNGKey(0), img)
    y, _ = enc.apply(p, img, False,
                     rngs={"dropout": jax.random.PRNGKey(1)})
    assert np.all(np.isfinite(np.asarray(y)))


# --------------------------------------------------------------- v2
def test_group_weights_roundtrip():
    """_group_weights + the v2 reference's ungrouping are inverse: the
    grouped layout computes exactly the ungrouped subblock."""
    x, wqkv, bqkv, wo, bo = _inputs(B=4, T=9, D=32)
    H, G = 4, 2
    wg, bg, wog = fs._group_weights(wqkv, bqkv, wo, H, G)
    assert wg.shape == (2, 32, 2 * 3 * 8)
    assert bg.shape == (2, 2 * 3 * 8)
    assert wog.shape == (2, 2 * 8, 32)
    got = fs._reference_subblock_v2(x, wg, bg, wog, bo, None, H, G,
                                    jnp.float32)
    want = fs._reference_subblock(x, wqkv, bqkv, wo, bo, None, H,
                                  jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@cpu_only
@pytest.mark.parametrize("with_bias", [False, True])
def test_v2_forward_matches_reference(interpret_pallas, with_bias):
    x, wqkv, bqkv, wo, bo = _inputs(B=6, T=17, D=32)
    B, T, D = x.shape
    bias = None
    if with_bias:
        rng = np.random.default_rng(1)
        bias = jnp.where(jnp.asarray(rng.random((B, T))) > 0.3, 0.0, -1e9)
    got = fs.fused_attn_subblock_v2(x, wqkv, bqkv, wo, bo, n_heads=4,
                                    group_size=2, key_bias=bias)
    want = fs._reference_subblock(x, wqkv, bqkv, wo, bo, bias, 4,
                                  jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


@cpu_only
def test_v2_gradients_flow_through_vjp(interpret_pallas):
    """The v2 custom VJP (grouped-layout XLA recompute) matches autodiff
    of the ungrouped reference, including the weight grads mapped back
    through the grouping."""
    x, wqkv, bqkv, wo, bo = _inputs(B=4, T=9, D=32)
    rng = np.random.default_rng(2)
    proj = jnp.asarray(rng.standard_normal(x.shape), jnp.float32)

    def loss_v2(x_, wqkv_, bqkv_, wo_, bo_):
        y = fs.fused_attn_subblock_v2(x_, wqkv_, bqkv_, wo_, bo_,
                                      n_heads=4, group_size=2)
        return jnp.sum(y * proj)

    def loss_ref(x_, wqkv_, bqkv_, wo_, bo_):
        y = fs._reference_subblock(x_, wqkv_, bqkv_, wo_, bo_, None, 4,
                                   jnp.float32)
        return jnp.sum(y * proj)

    g_v2 = jax.grad(loss_v2, argnums=(0, 1, 2, 3, 4))(x, wqkv, bqkv, wo, bo)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, wqkv, bqkv, wo, bo)
    for name, a, b in zip(["x", "wqkv", "bqkv", "wo", "bo"], g_v2, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_v2_supported_geometry():
    assert fs.supported_v2(352, 197, 768, 12, 4)
    assert fs.supported_v2(352, 30, 768, 12, 4)
    assert not fs.supported_v2(352, 197, 768, 12, 5)   # G must divide H
    assert not fs.supported_v2(8, 20000, 768, 8, 4)    # VMEM overflow
