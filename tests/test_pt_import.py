"""Legacy-cache migration: a reference-layout directory of per-item
``{prefix}_{key}.pt`` files (Code_Cached/preprocess_vectors.py:27-31)
imports transparently into the dense memmap store."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from iisan_tpu.data.cache_store import (HiddenStateCache,
                                        import_reference_pt_dir)


def test_import_reference_pt_dir(tmp_path):
    names = ["<pad>", "B001", "B002", "B003"]
    rng = np.random.default_rng(0)
    want = {}
    pt_dir = tmp_path / "bert_outputs"
    os.makedirs(pt_dir)
    for n in names[1:]:
        t = rng.standard_normal((13, 32)).astype(np.float32)
        want[n] = t
        torch.save(torch.tensor(t), pt_dir / f"bert_{n}.pt")

    store = import_reference_pt_dir(str(pt_dir), "bert", names,
                                    str(tmp_path / "bert.memmap"),
                                    dtype="float32")
    full = store.load_full()
    assert full.shape == (4, 13, 32)
    assert np.all(full[0] == 0)  # pad row
    for i, n in enumerate(names[1:], start=1):
        np.testing.assert_allclose(full[i], want[n], atol=1e-6)

    # reopen from disk
    re = HiddenStateCache.open(str(tmp_path / "bert.memmap"))
    np.testing.assert_allclose(re.load_taps([0, 4])[2],
                               want["B002"][[0, 4]], atol=1e-6)


def test_pipelines_open_cache_imports_pt(tmp_path):
    """open_cache falls back to importing a reference-layout .pt dir
    (pipelines.py)."""
    from types import SimpleNamespace

    from iisan_tpu.train.pipelines import open_cache

    names = ["<pad>", "X1", "X2"]
    pt_dir = tmp_path / "vecs" / "bert_outputs"
    os.makedirs(pt_dir)
    for n in names[1:]:
        torch.save(torch.zeros(5, 8), pt_dir / f"bert_{n}.pt")

    cfg = SimpleNamespace(stored_vector_path=str(tmp_path / "vecs"),
                          cached_text_model="bert_outputs",
                          cached_text_prefix="bert")
    corpus = SimpleNamespace(item_names=names)
    store = open_cache(cfg, "text", corpus)
    assert store.meta.n_items == 3 and store.meta.n_layers == 5
    # second call opens the converted memmap directly
    store2 = open_cache(cfg, "text", corpus)
    assert store2.meta.dim == 8
