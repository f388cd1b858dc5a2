"""Cache-builder + cache-store tests: the builder's output must match a
direct tower forward (the contract of preprocess_vectors.py:68-112), and
the store's layer-tap gather must slice correctly."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from iisan_tpu.cache_builder import (build_image_cache, build_text_cache,
                                     verify_cache)
from iisan_tpu.data.cache_store import HiddenStateCache
from iisan_tpu.data.images import SyntheticImageStore
from iisan_tpu.models.bert import BertEncoder
from iisan_tpu.models.vit import ViTEncoder


def test_text_cache_matches_direct_forward(tmp_path):
    bert = BertEncoder(vocab_size=100, hidden_dim=16, num_layers=2,
                       num_heads=2, intermediate_dim=32, max_position=16,
                       dropout=0.0)
    rng = np.random.default_rng(0)
    n_items, nw = 10, 5
    tokens = np.zeros((n_items, 2 * nw), np.int32)
    tokens[1:, :nw] = rng.integers(1, 100, size=(n_items - 1, nw))
    tokens[1:, nw:] = 1
    params = bert.init(jax.random.PRNGKey(0), jnp.asarray(tokens[:1, :nw]),
                       jnp.asarray(tokens[:1, nw:]))["params"]

    store = build_text_cache(bert, params, tokens, str(tmp_path / "text"),
                             batch=4, dtype="float32")
    verify_cache(store, 3, 16)

    # direct forward of item 3
    _, hiddens = bert.apply({"params": params},
                            jnp.asarray(tokens[3:4, :nw]),
                            jnp.asarray(tokens[3:4, nw:]))
    want = np.asarray(hiddens[:, 0, 0, :])  # (layers+1, D) CLS
    got = store.load_full()[3]
    np.testing.assert_allclose(got, want, atol=1e-5)
    # padding row stays zero
    assert np.all(store.load_full()[0] == 0)


def _tiny_bert_and_tokens(n_items=11, nw=5, seed=0):
    bert = BertEncoder(vocab_size=100, hidden_dim=16, num_layers=2,
                       num_heads=2, intermediate_dim=32, max_position=16,
                       dropout=0.0)
    rng = np.random.default_rng(seed)
    tokens = np.zeros((n_items, 2 * nw), np.int32)
    tokens[1:, :nw] = rng.integers(1, 100, size=(n_items - 1, nw))
    tokens[1:, nw:] = 1
    params = bert.init(jax.random.PRNGKey(0), jnp.asarray(tokens[:1, :nw]),
                       jnp.asarray(tokens[:1, nw:]))["params"]
    return bert, params, tokens


def test_sharded_text_build_matches_single(tmp_path):
    """Three shard processes writing disjoint [lo, hi) ranges into one
    store reproduce the single-process build exactly (incl. the int8
    scale sidecar); create_or_open arbitrates the store creation."""
    bert, params, tokens = _tiny_bert_and_tokens()
    n = tokens.shape[0]
    for dtype in ("float32", "int8"):
        single = build_text_cache(bert, params, tokens,
                                  str(tmp_path / f"single_{dtype}"),
                                  batch=3, dtype=dtype)
        per = -(-(n - 1) // 3)
        for shard in range(3):
            lo = 1 + shard * per
            hi = min(1 + (shard + 1) * per, n)
            st = build_text_cache(bert, params, tokens,
                                  str(tmp_path / f"sharded_{dtype}"),
                                  batch=3, dtype=dtype,
                                  start_item=lo, end_item=hi)
            verify_cache(st, 3, 16, first_row=lo)
        sharded = HiddenStateCache.open(str(tmp_path / f"sharded_{dtype}"))
        np.testing.assert_array_equal(np.asarray(sharded._arr),
                                      np.asarray(single._arr))
        if dtype == "int8":
            np.testing.assert_array_equal(np.asarray(sharded._scales),
                                          np.asarray(single._scales))


def test_shard_range_partitions_rows():
    """Every row 1..n-1 is covered exactly once, for even and uneven
    splits and for more shards than rows."""
    from iisan_tpu.tools.build_caches import shard_range

    assert shard_range(100, 0, 1) == (1, None)
    for n_rows, num_shards in [(101, 4), (10, 3), (5, 8), (2, 2)]:
        seen = []
        for s in range(num_shards):
            lo, hi = shard_range(n_rows, s, num_shards)
            assert 1 <= lo <= hi <= n_rows
            seen.extend(range(lo, hi))
        assert seen == list(range(1, n_rows))


def test_create_or_open_geometry_mismatch(tmp_path):
    import pytest

    HiddenStateCache.create_or_open(str(tmp_path / "c"), 8, 3, 16)
    # matching geometry reopens writable; the data is preserved
    st = HiddenStateCache.create_or_open(str(tmp_path / "c"), 8, 3, 16)
    st.write_rows(2, np.ones((1, 3, 16), np.float32))
    st.flush()
    assert np.all(HiddenStateCache.open(str(tmp_path / "c")).load_full()[2]
                  == 1)
    with pytest.raises(ValueError):
        HiddenStateCache.create_or_open(str(tmp_path / "c"), 8, 3, 32)


def test_create_or_open_concurrent(tmp_path):
    """Two threads race create_or_open; exactly one creates, both write
    their rows, nothing is lost."""
    import threading

    errs = []

    def worker(row):
        try:
            st = HiddenStateCache.create_or_open(str(tmp_path / "c"),
                                                 6, 2, 8)
            st.write_rows(row, np.full((1, 2, 8), row, np.float32))
            st.flush()
        except Exception as e:  # pragma: no cover
            errs.append(e)

    ts = [threading.Thread(target=worker, args=(r,)) for r in (1, 4)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert not errs
    full = HiddenStateCache.open(str(tmp_path / "c")).load_full()
    assert np.all(full[1] == 1) and np.all(full[4] == 4)


def test_shard_files_merge_matches_single(tmp_path):
    """Multi-host mode: per-shard stores + merge_shard_stores reproduce
    the single-process build exactly (no shared-file writes at all)."""
    from iisan_tpu.data.cache_store import (merge_shard_stores,
                                            write_shard_range)
    from iisan_tpu.tools.build_caches import shard_range

    bert, params, tokens = _tiny_bert_and_tokens()
    n = tokens.shape[0]
    for dtype in ("float16", "int8"):
        single = build_text_cache(bert, params, tokens,
                                  str(tmp_path / f"single_{dtype}"),
                                  batch=4, dtype=dtype)
        base = str(tmp_path / f"m_{dtype}" / "text.memmap")
        for shard in range(3):
            lo, hi = shard_range(n, shard, 3)
            p = base + f".shard{shard}"
            build_text_cache(bert, params, tokens, p, batch=4,
                             dtype=dtype, start_item=lo, end_item=hi)
            write_shard_range(p, lo, hi)
        merged = merge_shard_stores(base)
        np.testing.assert_array_equal(np.asarray(merged._arr),
                                      np.asarray(single._arr))
        if dtype == "int8":
            np.testing.assert_array_equal(np.asarray(merged._scales),
                                          np.asarray(single._scales))
        # shard dirs are removed after a successful merge
        import glob

        assert glob.glob(base + ".shard*") == []


def test_cli_finalize_shards(tmp_path):
    """iisan-tpu-build-caches --finalize-shards merges every *.shard*
    store under --out and errors cleanly when there are none."""
    import pytest

    from iisan_tpu.data.cache_store import (HiddenStateCache,
                                            write_shard_range)
    from iisan_tpu.tools.build_caches import main

    base = str(tmp_path / "bert_outputs.memmap")
    for shard, (lo, hi) in enumerate([(1, 5), (5, 10)]):
        p = base + f".shard{shard}"
        st = HiddenStateCache.create(p, 10, 2, 8)
        st.write_rows(lo, np.full((hi - lo, 2, 8), shard + 1, np.float32))
        st.flush()
        write_shard_range(p, lo, hi)
    main(["--out", str(tmp_path), "--finalize-shards"])
    full = HiddenStateCache.open(base).load_full()
    assert np.all(full[1:5] == 1) and np.all(full[5:10] == 2)
    assert np.all(full[0] == 0)
    with pytest.raises(SystemExit):
        main(["--out", str(tmp_path / "empty"), "--finalize-shards"])


def test_merge_shard_stores_rejects_gaps(tmp_path):
    import pytest

    from iisan_tpu.data.cache_store import (HiddenStateCache,
                                            merge_shard_stores,
                                            write_shard_range)

    base = str(tmp_path / "c")
    for shard, (lo, hi) in enumerate([(1, 4), (6, 10)]):  # row 4..5 gap
        p = base + f".shard{shard}"
        HiddenStateCache.create(p, 10, 2, 8)
        write_shard_range(p, lo, hi)
    with pytest.raises(ValueError, match="do not tile"):
        merge_shard_stores(base)


def test_text_cache_int8_store(tmp_path):
    """dtype='int8': the builder writes quantized rows + scales; the
    dequantized store matches the direct forward within the per-row
    quantization bound (ops/quant.py)."""
    bert, params, tokens = _tiny_bert_and_tokens(n_items=10)
    nw = 5

    store = build_text_cache(bert, params, tokens, str(tmp_path / "q"),
                             batch=4, dtype="int8")
    verify_cache(store, 3, 16)
    _, hiddens = bert.apply({"params": params},
                            jnp.asarray(tokens[3:4, :nw]),
                            jnp.asarray(tokens[3:4, nw:]))
    want = np.asarray(hiddens[:, 0, 0, :])  # (layers+1, D) CLS
    got = store.load_full()[3]
    bound = np.max(np.abs(want), axis=-1, keepdims=True) / 254 + 1e-6
    assert np.all(np.abs(got - want) <= bound)
    assert np.all(store.load_full()[0] == 0)


def test_text_cache_mean_pooling(tmp_path):
    """Llama-style mean-over-tokens pooling
    (preprocess_llama-3-70b_micro.py:67-70)."""
    bert = BertEncoder(vocab_size=50, hidden_dim=8, num_layers=1,
                       num_heads=2, intermediate_dim=16, max_position=8,
                       dropout=0.0)
    tokens = np.zeros((3, 8), np.int32)
    tokens[1:, :4] = [[5, 6, 0, 0], [7, 8, 9, 0]]
    tokens[1, 4:6] = 1
    tokens[2, 4:7] = 1
    params = bert.init(jax.random.PRNGKey(0), jnp.asarray(tokens[:1, :4]),
                       jnp.asarray(tokens[:1, 4:]))["params"]
    store = build_text_cache(bert, params, tokens, str(tmp_path / "mean"),
                             batch=2, pool="mean", dtype="float32")
    _, hiddens = bert.apply({"params": params}, jnp.asarray(tokens[1:2, :4]),
                            jnp.asarray(tokens[1:2, 4:]))
    h = np.asarray(hiddens[:, 0])  # (layers+1, T, D)
    want = h[:, :2].mean(axis=1)   # masked mean over the 2 valid tokens
    np.testing.assert_allclose(store.load_full()[1], want, atol=1e-5)


def test_image_cache_and_taps(tmp_path):
    vit = ViTEncoder(image_size=8, patch_size=4, hidden_dim=16, num_layers=2,
                     num_heads=2, intermediate_dim=32)
    params = vit.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 8, 8, 3)))["params"]
    names = ["<pad>"] + [f"it{i}" for i in range(1, 7)]
    store = build_image_cache(vit, params, names,
                              SyntheticImageStore(resize=8),
                              str(tmp_path / "img"), resize=8, batch=4,
                              dtype="float32")
    full = store.load_full()
    assert full.shape == (7, 3, 16)
    taps = store.load_taps([0, 2])
    np.testing.assert_allclose(taps, full[:, [0, 2], :])
    assert np.all(full[0] == 0)


def test_cache_reopen(tmp_path):
    store = HiddenStateCache.create(str(tmp_path / "c"), 4, 3, 8, "float16")
    data = np.arange(3 * 8, dtype=np.float16).reshape(1, 3, 8)
    store.write_rows(2, data)
    store.flush()
    re = HiddenStateCache.open(str(tmp_path / "c"))
    np.testing.assert_array_equal(re.load_full()[2],
                                  data[0].astype(np.float32))


def test_start_item_resume_preserves_existing_rows(tmp_path):
    """The documented crash-resume path: re-running with start_item must
    reopen the existing store writable, NOT truncate it (a 'w+' reopen
    zero-fills every previously built row)."""
    bert = BertEncoder(vocab_size=100, hidden_dim=16, num_layers=2,
                       num_heads=2, intermediate_dim=32, max_position=16,
                       dropout=0.0)
    rng = np.random.default_rng(1)
    n_items, nw = 12, 5
    tokens = np.zeros((n_items, 2 * nw), np.int32)
    tokens[1:, :nw] = rng.integers(1, 100, size=(n_items - 1, nw))
    tokens[1:, nw:] = 1
    params = bert.init(jax.random.PRNGKey(0), jnp.asarray(tokens[:1, :nw]),
                       jnp.asarray(tokens[:1, nw:]))["params"]

    full = build_text_cache(bert, params, tokens, str(tmp_path / "full"),
                            batch=4, dtype="float32")
    want = full.load_full()

    # simulate a crash after 8 rows: full-geometry store with the tail
    # rows never written (still zero)
    part = build_text_cache(bert, params, tokens, str(tmp_path / "resume"),
                            batch=4, dtype="float32")
    part._arr[8:] = 0
    part.flush()
    del part
    resumed = build_text_cache(bert, params, tokens,
                               str(tmp_path / "resume"), batch=4,
                               dtype="float32", start_item=8)
    np.testing.assert_allclose(resumed.load_full(), want, atol=1e-6)

    # geometry drift on resume is a loud error, not silent corruption
    import pytest

    with pytest.raises(ValueError, match="resume"):
        HiddenStateCache.create(str(tmp_path / "resume"), n_items, 3, 32,
                                "float32", resume=True)

    # resuming into a path with no store is also a loud error: silently
    # creating fresh would leave rows [1, start_item) all-zero
    with pytest.raises(FileNotFoundError, match="resume"):
        build_text_cache(bert, params, tokens, str(tmp_path / "nothing"),
                         batch=4, dtype="float32", start_item=8)


def test_load_taps_parallel_matches_serial(tmp_path):
    """The threaded/madvise gather must equal the naive fancy index for
    sparse, dense, unsorted and duplicate layer selections, in both float
    and int8 stores."""
    import numpy as np

    from iisan_tpu.data.cache_store import HiddenStateCache
    from iisan_tpu.ops.quant import QuantTaps, dequantize

    rng = np.random.default_rng(0)
    states = rng.standard_normal((37, 9, 8)).astype(np.float32)
    for dtype in ("float32", "int8"):
        st = HiddenStateCache.create(str(tmp_path / f"s_{dtype}"), 37, 9, 8,
                                     dtype=dtype)
        st.write_rows(1, states[1:])
        st.flush()
        for sel in ([1, 3, 5, 7], list(range(9)), [5, 1, 3], [2, 2, 4]):
            got = st.load_taps(sel, num_threads=4)
            got1 = st.load_taps(sel, num_threads=1)
            if isinstance(got, QuantTaps):
                got = np.asarray(dequantize(got), np.float32)
                got1 = np.asarray(dequantize(got1), np.float32)
                want = None  # int8 path: compare threaded vs serial only
            else:
                want = states[:, sel, :].copy()
                want[0] = 0.0
            np.testing.assert_array_equal(got, got1)
            if want is not None:
                np.testing.assert_allclose(got, want, atol=1e-6)


def test_load_taps_empty_selection(tmp_path):
    """load_taps([]) keeps numpy's arr[:, [], :] semantics — an empty
    (n, 0, dim) array, not IndexError (ADVICE r3)."""
    import numpy as np

    from iisan_tpu.data.cache_store import HiddenStateCache

    st = HiddenStateCache.create(str(tmp_path / "s"), 5, 4, 8)
    st.write_rows(1, np.ones((4, 4, 8), np.float32))
    st.flush()
    got = st.load_taps([])
    assert got.shape == (5, 0, 8)
