"""Int8 quantized tap tables (ops/quant.py, cache_quant="int8").

TPU-native extension: halves the HBM residency / gather bandwidth of the
cached pipelines' device-resident tap tables (the per-chip catalog ceiling
at IISAN-Versa geometry).  Covers the quantizer's error bound, the
polymorphic gather, end-to-end cached training/eval under quantization,
and the flag's validation.
"""

import numpy as np
import pytest

from iisan_tpu.config import IISANConfig
from iisan_tpu.data.synthetic import synthetic_corpus, synthetic_taps
from iisan_tpu.ops.quant import QuantTaps, dequantize, gather_rows, quantize_taps


def _small_cfg(**kw):
    base = dict(batch_size=8, epoch=1, embedding_dim=16,
                side_adapter_vit_list="1,3", side_adapter_bert_list="1,3",
                side_adapter_mm_list="1,3", compute_dtype="float32",
                word_embedding_dim=32, image_embedding_dim=32,
                drop_rate=0.0, adapter_dropout_rate=0.0, seed=7,
                eval_batch_size=32, save_checkpoints=False)
    base.update(kw)
    return IISANConfig(**base)


# ---------------------------------------------------------------------------
# quantizer math
# ---------------------------------------------------------------------------

def test_quantize_error_bound(rng):
    x = rng.normal(size=(17, 3, 64)).astype(np.float32) * \
        rng.uniform(0.1, 10.0, size=(17, 1, 1)).astype(np.float32)
    t = quantize_taps(x, out_dtype="float32")
    back = np.asarray(dequantize(t))
    # symmetric absmax int8: per-element error <= scale/2 = absmax/254
    absmax = np.max(np.abs(x), axis=-1, keepdims=True)
    assert np.all(np.abs(back - x) <= absmax / 254 + 1e-7)


def test_quantize_zero_rows_stay_zero():
    x = np.zeros((4, 2, 8), np.float32)
    x[2, 1] = 3.0  # one non-zero row among zero rows
    t = quantize_taps(x, out_dtype="float32")
    back = np.asarray(dequantize(t))
    assert np.all(back[0] == 0) and np.all(back[1] == 0)
    assert np.all(back[3] == 0)
    np.testing.assert_allclose(back[2, 1], x[2, 1], rtol=1e-2)


def test_gather_rows_matches_dequant(rng):
    x = rng.normal(size=(11, 2, 16)).astype(np.float32)
    t = quantize_taps(x, out_dtype="float32")
    ids = np.array([0, 3, 10, 10, 7], np.int32)
    got = np.asarray(gather_rows(t, ids))
    np.testing.assert_array_equal(got, np.asarray(dequantize(t))[ids])
    # clip semantics: out-of-range ids read the last row, like jnp.take
    got_clip = np.asarray(gather_rows(t, np.array([99], np.int32)))
    np.testing.assert_array_equal(got_clip[0], np.asarray(dequantize(t))[-1])


def test_gather_rows_plain_array_passthrough(rng):
    x = rng.normal(size=(5, 2, 4)).astype(np.float32)
    ids = np.array([1, 4], np.int32)
    np.testing.assert_array_equal(np.asarray(gather_rows(x, ids)), x[ids])


def test_quant_taps_is_pytree():
    import jax

    t = quantize_taps(np.ones((3, 2, 4), np.float32), out_dtype="bfloat16")
    leaves, treedef = jax.tree_util.tree_flatten(t)
    assert len(leaves) == 2
    t2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert isinstance(t2, QuantTaps) and t2.out_dtype == "bfloat16"


# ---------------------------------------------------------------------------
# end-to-end cached training under int8
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def corpus_and_taps():
    cfg = _small_cfg()
    corpus = synthetic_corpus(n_users=64, item_num=50, seed=0)
    k = len(cfg.san_image_taps())
    cv = synthetic_taps(corpus.item_num, k, 32, seed=1)
    text = synthetic_taps(corpus.item_num, k, 32, seed=2)
    return corpus, cv, text


def test_cached_training_int8_tracks_fp(corpus_and_taps):
    from iisan_tpu.train.cached import CachedTrainer

    corpus, cv, text = corpus_and_taps
    fp = CachedTrainer(_small_cfg(), corpus, cv, text)
    q = CachedTrainer(_small_cfg(cache_quant="int8"), corpus, cv, text)
    assert isinstance(q.cv_table, QuantTaps)
    assert q.cv_table.q.dtype == np.int8

    loss_fp = [fp.run_epoch(e) for e in range(2)]
    loss_q = [q.run_epoch(e) for e in range(2)]
    # ~0.4% feature noise must not change the optimization trajectory
    np.testing.assert_allclose(loss_q, loss_fp, rtol=2e-2)
    assert loss_q[1] < loss_q[0]  # still learns

    m_fp = fp.evaluate_split("valid")
    m_q = q.evaluate_split("valid")
    assert abs(m_fp[0] - m_q[0]) < 0.1
    assert abs(m_fp[1] - m_q[1]) < 0.1


def test_fused_epoch_eval_consistent_under_int8(corpus_and_taps):
    """run_epoch_with_eval == run_epoch + evaluate_split, both quantized
    (the fused-dispatch bit-identity claim holds for QuantTaps tables)."""
    from iisan_tpu.train.cached import CachedTrainer

    corpus, cv, text = corpus_and_taps
    a = CachedTrainer(_small_cfg(cache_quant="int8"), corpus, cv, text)
    b = CachedTrainer(_small_cfg(cache_quant="int8"), corpus, cv, text)
    loss_a, hit_a, ndcg_a = a.run_epoch_with_eval(0)
    loss_b = b.run_epoch(0)
    hit_b, ndcg_b = b.evaluate_split("valid")
    np.testing.assert_allclose(loss_a, loss_b, rtol=1e-6)
    np.testing.assert_allclose([hit_a, ndcg_a], [hit_b, ndcg_b], atol=1e-6)


def test_multi_epoch_dispatch_under_int8(corpus_and_taps):
    from iisan_tpu.train.cached import CachedTrainer

    corpus, cv, text = corpus_and_taps
    a = CachedTrainer(_small_cfg(cache_quant="int8"), corpus, cv, text)
    b = CachedTrainer(_small_cfg(cache_quant="int8"), corpus, cv, text)
    fused = a.run_epochs(0, 2)
    seq = [b.run_epoch(0), b.run_epoch(1)]
    np.testing.assert_allclose(fused, seq, rtol=1e-5)


def test_memory_halves():
    """The device residency claim: int8 leaves are half the bf16 bytes."""
    cfg = _small_cfg(cache_quant="int8", compute_dtype="bfloat16")
    x = np.random.default_rng(0).normal(size=(100, 3, 64)).astype(np.float32)
    t = quantize_taps(x, out_dtype="bfloat16")
    bf16_bytes = x.size * 2
    q_bytes = t.q.size * 1 + t.scale.size * 4
    assert q_bytes < 0.6 * bf16_bytes


# ---------------------------------------------------------------------------
# int8 on-disk store (HiddenStateCache dtype="int8")
# ---------------------------------------------------------------------------

def test_int8_store_roundtrip(tmp_path, rng):
    from iisan_tpu.data.cache_store import HiddenStateCache

    x = rng.normal(size=(9, 5, 16)).astype(np.float32)  # rows 1..9
    store = HiddenStateCache.create(str(tmp_path / "c"), 10, 5, 16, "int8")
    store.write_rows(1, x)
    store.flush()

    re = HiddenStateCache.open(str(tmp_path / "c"))
    assert re.meta.dtype == "int8"
    taps = re.load_taps([0, 2, 4])
    assert isinstance(taps, QuantTaps)
    assert taps.q.shape == (10, 3, 16) and taps.q.dtype == np.int8
    back = np.asarray(dequantize(taps), dtype=np.float32)
    absmax = np.max(np.abs(x[:, [0, 2, 4]]), axis=-1, keepdims=True)
    assert np.all(np.abs(back[1:] - x[:, [0, 2, 4]]) <= absmax / 254 + 1e-7)
    assert np.all(back[0] == 0)  # pad row stays exactly zero
    full = re.load_full()
    assert np.all(np.abs(full[1:] - x) <=
                  np.max(np.abs(x), -1, keepdims=True) / 254 + 1e-7)
    # disk: int8 data + fp32 per-(item,layer) scales ~ half of fp16
    import os

    data = os.path.getsize(tmp_path / "c" / "states.bin")
    scales = os.path.getsize(tmp_path / "c" / "scales.bin")
    assert data == 10 * 5 * 16 and scales == 10 * 5 * 4


def test_int8_store_resume_requires_scales(tmp_path):
    from iisan_tpu.data.cache_store import HiddenStateCache

    HiddenStateCache.create(str(tmp_path / "c"), 4, 2, 8, "int8")
    (tmp_path / "c" / "scales.bin").unlink()
    with pytest.raises(FileNotFoundError):
        HiddenStateCache.create(str(tmp_path / "c"), 4, 2, 8, "int8",
                                resume=True)


def test_trainer_consumes_int8_store(tmp_path, corpus_and_taps):
    """An int8 store's load_taps output feeds CachedTrainer directly and
    reproduces the dense int8 path (same quantized values either way)."""
    from iisan_tpu.data.cache_store import HiddenStateCache
    from iisan_tpu.train.cached import CachedTrainer

    corpus, cv, text = corpus_and_taps
    stores = []
    for name, arr in (("cv", cv), ("text", text)):
        st = HiddenStateCache.create(str(tmp_path / name), arr.shape[0],
                                     arr.shape[1], arr.shape[2], "int8")
        st.write_rows(1, arr[1:])
        st.flush()
        stores.append(HiddenStateCache.open(str(tmp_path / name)))
    taps_cv = stores[0].load_taps(range(cv.shape[1]))
    taps_text = stores[1].load_taps(range(text.shape[1]))

    a = CachedTrainer(_small_cfg(), corpus, taps_cv, taps_text)
    assert isinstance(a.cv_table, QuantTaps)
    b = CachedTrainer(_small_cfg(cache_quant="int8"), corpus, cv, text)
    la = [a.run_epoch(e) for e in range(2)]
    lb = [b.run_epoch(e) for e in range(2)]
    np.testing.assert_allclose(la, lb, rtol=1e-6)


# ---------------------------------------------------------------------------
# flag validation
# ---------------------------------------------------------------------------

def test_cache_quant_validation():
    from iisan_tpu.train.pipelines import validate_config

    with pytest.raises(ValueError, match="cache_quant"):
        validate_config(_small_cfg(cache_quant="int4"))
    with pytest.raises(ValueError, match="cached pipelines"):
        validate_config(_small_cfg(cache_quant="int8", pipeline="uncached"))
    with pytest.raises(ValueError, match="cached pipelines"):
        validate_config(_small_cfg(cache_quant="int8", item_tower="id"))
    validate_config(_small_cfg(cache_quant="int8"))  # cached: fine
    validate_config(_small_cfg(cache_quant="int8", pipeline="cached_asym"))


def test_trainer_rejects_unknown_quant(corpus_and_taps):
    from iisan_tpu.train.cached import CachedTrainer

    corpus, cv, text = corpus_and_taps
    with pytest.raises(ValueError, match="cache_quant"):
        CachedTrainer(_small_cfg(cache_quant="fp4"), corpus, cv, text)
