"""Int8 (W8A8) frozen-tower tests: quantized linear numerics, graft-time
weight conversion, config gating, and end-to-end uncached training.

TPU-native extension (ops/int8_linear.py): the reference runs its frozen
towers in fp16 autocast (/root/reference/Code_Uncached/run.py:380-385);
on TPU the frozen-tower matmuls run int8 on the MXU at 2x the bf16 rate.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iisan_tpu.config import IISANConfig
from iisan_tpu.ops.int8_linear import (Int8Dense, int8_matmul,
                                       quantize_dense_tree, quantize_kernel)

cpu_only = pytest.mark.skipif(
    jax.default_backend() == "tpu",
    reason="interpret-mode tolerances are defined on the CPU tier")
requires_tpu = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="needs the real TPU")


def tiny_cfg(**kw):
    base = dict(
        batch_size=8, epoch=1, embedding_dim=16,
        word_embedding_dim=32, image_embedding_dim=32,
        text_layers=2, image_layers=2,
        CV_resize=16, num_words_title=6,
        side_adapter_vit_list="0,1", side_adapter_bert_list="0,1",
        bert_adapter_down_size=8, cv_adapter_down_size=8,
        adapter_type="IISAN", adding_adapter_to="all",
        fine_tune_to="None",
        compute_dtype="float32", max_seq_len=4, min_seq_len=3,
        tower_quant="int8")
    base.update(kw)
    return IISANConfig(**base)


def make_trainer(cfg):
    from iisan_tpu.data.images import SyntheticImageStore
    from iisan_tpu.data.synthetic import synthetic_corpus
    from iisan_tpu.train.uncached import UncachedTrainer

    corpus = synthetic_corpus(n_users=12, item_num=20,
                              max_seq_len=cfg.max_seq_len,
                              min_seq_len=cfg.min_seq_len)
    tokens = np.random.default_rng(0).integers(
        1, 99, size=(21, 2 * cfg.num_words_title)).astype(np.int32)
    tokens[:, cfg.num_words_title:] = 1
    tokens[0] = 0
    return UncachedTrainer(cfg, corpus, tokens,
                           SyntheticImageStore(cfg.CV_resize))


# ---------------------------------------------------------------------------
# unit: quantized matmul numerics
# ---------------------------------------------------------------------------

def test_int8_matmul_matches_float_within_quant_error():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((64, 96)).astype(np.float32)
    w = (rng.standard_normal((96, 128)) * 0.1).astype(np.float32)
    b = rng.standard_normal(128).astype(np.float32)
    q, s = quantize_kernel(w)
    y_ref = x @ w + b
    y = np.asarray(int8_matmul(jnp.asarray(x), jnp.asarray(q),
                               jnp.asarray(s), jnp.asarray(b), jnp.float32))
    rel = np.linalg.norm(y - y_ref) / np.linalg.norm(y_ref)
    # two symmetric-absmax int8 operands: ~0.45% RMS each
    assert rel < 0.025, rel


def test_int8_matmul_zero_row_and_zero_scale():
    # all-zero activations / channels must not divide by zero
    x = jnp.zeros((4, 8), jnp.float32)
    w = np.zeros((8, 6), np.float32)
    w[:, 0] = 1.0  # one live channel
    q, s = quantize_kernel(w)
    y = np.asarray(int8_matmul(x, jnp.asarray(q), jnp.asarray(s),
                               None, jnp.float32))
    assert np.all(np.isfinite(y)) and np.all(y == 0.0)


def test_int8dense_graft_matches_dense():
    """nn.Dense params quantized by quantize_dense_tree reproduce the
    float layer inside Int8Dense to quantization tolerance."""
    from flax import linen as nn

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((32, 48)), jnp.float32)
    dense = nn.Dense(24)
    params = dense.init(jax.random.PRNGKey(0), x)["params"]
    y_ref = np.asarray(dense.apply({"params": params}, x))
    qparams = quantize_dense_tree(
        {"kernel": np.asarray(params["kernel"]),
         "bias": np.asarray(params["bias"])})
    assert set(qparams) == {"kernel_q", "kscale", "bias"}
    assert qparams["kernel_q"].dtype == jnp.int8
    y = np.asarray(Int8Dense(24, dtype=jnp.float32).apply(
        {"params": qparams}, x))
    rel = np.linalg.norm(y - y_ref) / np.linalg.norm(y_ref)
    assert rel < 0.025, rel


def test_quantize_dense_tree_leaves_non_dense_nodes_alone():
    tree = {
        "layer_0": {
            "intermediate": {"kernel": np.ones((4, 8), np.float32),
                             "bias": np.zeros(8, np.float32)},
            "attention_layernorm": {"scale": np.ones(4, np.float32),
                                    "bias": np.zeros(4, np.float32)},
        },
        "word_embeddings": {"embedding": np.ones((10, 4), np.float32)},
        "position_embeddings": np.ones((16, 4), np.float32),
    }
    out = quantize_dense_tree(tree)
    assert set(out["layer_0"]["intermediate"]) == {"kernel_q", "kscale",
                                                   "bias"}
    # layernorm {scale, bias} has no 'kernel' — untouched
    assert set(out["layer_0"]["attention_layernorm"]) == {"scale", "bias"}
    assert set(out["word_embeddings"]) == {"embedding"}
    np.testing.assert_array_equal(out["position_embeddings"],
                                  tree["position_embeddings"])


# ---------------------------------------------------------------------------
# fused Pallas W8A8 kernel (ops/int8_pallas.py)
# ---------------------------------------------------------------------------

def _pallas_case(M, K, N, with_bias, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((M, K)) * 0.3, jnp.float32)
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.05
    q, s = quantize_kernel(w)
    b = jnp.asarray(rng.standard_normal(N), jnp.float32) if with_bias \
        else None
    return x, jnp.asarray(q), jnp.asarray(s), b


@cpu_only
@pytest.mark.parametrize("M,K,N,with_bias", [
    (300, 256, 384, True),    # row padding (300 -> block multiple)
    (512, 128, 128, False),   # no bias
    (7, 256, 256, True),      # fewer rows than one block
    (1000, 768, 3072, True),  # N-blocked (ViT MLP geometry)
])
def test_fused_w8a8_matches_xla(M, K, N, with_bias):
    """The one-pass kernel reproduces the XLA int8 formulation.  Not
    bitwise: the absmax/127 division can differ by 1 ulp across backends,
    flipping rint on exact-.5 ties (module docstring), so the tolerance
    is relative."""
    from iisan_tpu.ops.int8_pallas import fused_w8a8_matmul, supported

    assert supported(K, N, 4, 4)
    x, q, s, b = _pallas_case(M, K, N, with_bias)
    y_xla = np.asarray(int8_matmul(x, q, s, b, jnp.float32))
    y_pal = np.asarray(fused_w8a8_matmul(x, q, s, b, jnp.float32,
                                         interpret=True))
    rel = np.linalg.norm(y_pal - y_xla) / max(np.linalg.norm(y_xla), 1e-9)
    assert rel < 1e-3, rel


@cpu_only
def test_fused_w8a8_3d_and_grad():
    from iisan_tpu.ops.int8_pallas import fused_w8a8_matmul

    rng = np.random.default_rng(3)
    x3 = jnp.asarray(rng.standard_normal((4, 75, 256)) * 0.3, jnp.float32)
    w = rng.standard_normal((256, 128)).astype(np.float32) * 0.05
    q, s = quantize_kernel(w)
    q, s = jnp.asarray(q), jnp.asarray(s)
    y_xla = np.asarray(int8_matmul(x3, q, s, None, jnp.float32))
    y_pal = np.asarray(fused_w8a8_matmul(x3, q, s, None, jnp.float32,
                                         interpret=True))
    assert y_pal.shape == (4, 75, 128)
    rel = np.linalg.norm(y_pal - y_xla) / np.linalg.norm(y_xla)
    assert rel < 1e-3, rel
    # the custom VJP is the autodiff of the XLA formulation: rint blocks
    # the main path but gradient flows through the absmax -> scale chain
    g_pal = jax.grad(lambda xx: fused_w8a8_matmul(
        xx, q, s, None, jnp.float32, interpret=True).sum())(x3)
    g_xla = jax.grad(lambda xx: int8_matmul(
        xx, q, s, None, jnp.float32).sum())(x3)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_xla),
                               rtol=1e-4, atol=1e-6)
    # kscale cotangent: y scales linearly in kscale, so d/dkscale is
    # nonzero and must match the XLA path too (ADVICE r3: was zeroed)
    gs_pal = jax.grad(lambda ss: fused_w8a8_matmul(
        x3, q, ss, None, jnp.float32, interpret=True).sum())(s)
    gs_xla = jax.grad(lambda ss: int8_matmul(
        x3, q, ss, None, jnp.float32).sum())(s)
    assert float(jnp.abs(gs_xla).max()) > 0
    np.testing.assert_allclose(np.asarray(gs_pal), np.asarray(gs_xla),
                               rtol=1e-4, atol=1e-6)


@cpu_only
def test_fused_w8a8_unsupported_geometry():
    from iisan_tpu.ops.int8_pallas import fused_w8a8_matmul, supported

    assert not supported(257, 128)   # K not lane-aligned
    assert not supported(128, 130)   # N not lane-aligned
    # calling past the gate raises a clear error, not ZeroDivisionError
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((8, 257)), jnp.float32)
    q = jnp.zeros((257, 128), jnp.int8)
    s = jnp.ones((128,), jnp.float32)
    with pytest.raises(ValueError, match="unsupported geometry K=257"):
        fused_w8a8_matmul(x, q, s, None, jnp.float32, interpret=True)


def test_int8dense_pallas_impl_falls_back_off_tpu():
    """impl='pallas' silently takes the XLA path on CPU (backend gate) —
    the module stays runnable everywhere."""
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((32, 128)), jnp.float32)
    dense = Int8Dense(128, dtype=jnp.float32, impl="pallas")
    params = dense.init(jax.random.PRNGKey(0), x)["params"]
    y = dense.apply({"params": params}, x)
    y_ref = Int8Dense(128, dtype=jnp.float32).apply({"params": params}, x)
    if jax.default_backend() != "tpu":
        np.testing.assert_array_equal(np.asarray(y), np.asarray(y_ref))
    else:
        rel = (np.linalg.norm(np.asarray(y) - np.asarray(y_ref))
               / max(np.linalg.norm(np.asarray(y_ref)), 1e-9))
        assert rel < 1e-3, rel


@requires_tpu
def test_fused_w8a8_on_chip_matches_xla():
    from iisan_tpu.ops.int8_pallas import fused_w8a8_matmul

    x, q, s, b = _pallas_case(1024, 768, 768, True)
    y_xla = np.asarray(int8_matmul(x, q, s, b, jnp.float32))
    y_pal = np.asarray(fused_w8a8_matmul(x, q, s, b, jnp.float32))
    rel = np.linalg.norm(y_pal - y_xla) / np.linalg.norm(y_xla)
    assert rel < 1e-3, rel


# ---------------------------------------------------------------------------
# config gating
# ---------------------------------------------------------------------------

def test_tower_quant_requires_frozen_towers():
    from iisan_tpu.models.towers import towers_from_config

    for bad in (dict(adapter_type="fft", adding_adapter_to="None"),
                dict(adapter_type="lora"),
                dict(fine_tune_to="all"),
                dict(finetune_layernorm="vit")):
        with pytest.raises(ValueError, match="tower_quant"):
            towers_from_config(tiny_cfg(**bad))


def test_tower_quant_unknown_value_raises():
    from iisan_tpu.models.towers import towers_from_config

    with pytest.raises(ValueError, match="unsupported tower_quant"):
        towers_from_config(tiny_cfg(tower_quant="fp4"))


def test_tower_quant_pallas_demoted_raises_with_pointer():
    # 'int8_pallas' was removed from the user-facing values after the
    # round-4 sweep (INT8_IMPL_BENCH.json) showed the fused kernel loses
    # at every tower geometry; the error must point users at 'int8'.
    from iisan_tpu.models.towers import towers_from_config

    with pytest.raises(ValueError, match="int8_pallas.*removed"):
        towers_from_config(tiny_cfg(tower_quant="int8_pallas"))


# ---------------------------------------------------------------------------
# integration (tiny geometry, CPU-runnable)
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_uncached_int8_epoch_trains_and_freezes_towers():
    tr = make_trainer(tiny_cfg())
    kq = tr.params["image_tower"]["vit"]["layer_0"]["intermediate"]
    assert kq["kernel_q"].dtype == jnp.int8
    assert kq["kscale"].dtype == jnp.float32
    before = np.asarray(kq["kernel_q"])
    head_before = np.asarray(tr.params["san"]["fc_bert"]["kernel"])
    loss = tr.run_epoch(1)
    assert np.isfinite(loss)
    after = np.asarray(
        tr.params["image_tower"]["vit"]["layer_0"]["intermediate"]["kernel_q"])
    np.testing.assert_array_equal(before, after)  # frozen int8 weights
    head_after = np.asarray(tr.params["san"]["fc_bert"]["kernel"])
    assert not np.allclose(head_before, head_after)  # SAN still trains
    hit, ndcg = tr.evaluate_split("valid", batch_size=8)
    assert 0.0 <= hit <= 1.0


@pytest.mark.slow
def test_int8_item_embeddings_close_to_float():
    """Same weights, int8 vs float towers: item-embedding tables agree to
    quantization tolerance — validates the graft conversion + per-layer
    wiring (a misapplied scale anywhere would blow this up)."""
    cfg_f = tiny_cfg(tower_quant="none", tower_dropout=0.0)
    tr_f = make_trainer(cfg_f)
    pf = jax.tree_util.tree_map(np.asarray, tr_f.params)

    cfg_i = tiny_cfg(tower_dropout=0.0)
    tr_i = make_trainer(cfg_i)
    pi = dict(pf)
    pi["text_tower"] = dict(pf["text_tower"])
    pi["text_tower"]["bert"] = quantize_dense_tree(pf["text_tower"]["bert"])
    pi["image_tower"] = dict(pf["image_tower"])
    pi["image_tower"]["vit"] = quantize_dense_tree(pf["image_tower"]["vit"])
    tr_i.params = jax.device_put(pi)

    t_f = np.asarray(tr_f.item_embedding_tables(batch=16))
    t_i = np.asarray(tr_i.item_embedding_tables(batch=16))
    rel = np.linalg.norm(t_i - t_f) / max(np.linalg.norm(t_f), 1e-9)
    assert rel < 0.15, rel
    # direction preserved per item (pad row 0 excluded: both all-zero)
    num = np.sum(t_i[1:] * t_f[1:], axis=1)
    den = (np.linalg.norm(t_i[1:], axis=1)
           * np.linalg.norm(t_f[1:], axis=1) + 1e-9)
    assert np.min(num / den) > 0.95


@pytest.mark.slow
def test_int8_graft_path_through_trainer():
    """tower_params float trees are quantized at graft time when
    tower_quant='int8' (train/uncached.py::_quantize_grafted)."""
    cfg_f = tiny_cfg(tower_quant="none")
    tr_f = make_trainer(cfg_f)
    pf = jax.tree_util.tree_map(np.asarray, tr_f.params)

    from iisan_tpu.data.images import SyntheticImageStore
    from iisan_tpu.data.synthetic import synthetic_corpus
    from iisan_tpu.train.uncached import UncachedTrainer

    cfg = tiny_cfg()
    corpus = synthetic_corpus(n_users=12, item_num=20,
                              max_seq_len=cfg.max_seq_len,
                              min_seq_len=cfg.min_seq_len)
    tokens = np.random.default_rng(0).integers(
        1, 99, size=(21, 2 * cfg.num_words_title)).astype(np.int32)
    tokens[:, cfg.num_words_title:] = 1
    tokens[0] = 0
    tr = UncachedTrainer(
        cfg, corpus, tokens, SyntheticImageStore(cfg.CV_resize),
        tower_params={"text_tower/bert": pf["text_tower"]["bert"],
                      "image_tower/vit": pf["image_tower"]["vit"]})
    kq = tr.params["text_tower"]["bert"]["layer_0"]["intermediate"]
    assert kq["kernel_q"].dtype == jnp.int8
    # grafted quantized weights == direct quantization of the float tree
    q_direct, _ = quantize_kernel(
        pf["text_tower"]["bert"]["layer_0"]["intermediate"]["kernel"])
    np.testing.assert_array_equal(np.asarray(kq["kernel_q"]), q_direct)
    assert np.isfinite(tr.run_epoch(1))
