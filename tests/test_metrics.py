"""Ranking-metric tests (metrics_topK semantics, metrics.py:59-67)."""

import jax.numpy as jnp
import numpy as np

from iisan_tpu.ops.metrics import hit_ndcg_at_k, mask_history


def test_rank_and_ndcg():
    scores = jnp.asarray([[0.1, 0.9, 0.5, 0.3]])
    # target idx 2 (score .5): one score greater -> rank 2
    m = np.asarray(hit_ndcg_at_k(scores, jnp.asarray([2]), k=10))[0]
    assert m[0] == 1.0
    np.testing.assert_allclose(m[1], 1 / np.log2(3), rtol=1e-6)


def test_hit_cutoff():
    n = 20
    scores = jnp.asarray(np.arange(n, dtype=np.float32)[None, :])
    # target is the lowest score -> rank 20 -> miss at k=10
    m = np.asarray(hit_ndcg_at_k(scores, jnp.asarray([0]), k=10))[0]
    assert m[0] == 0.0 and m[1] == 0.0
    # highest score -> rank 1 -> hit, ndcg 1
    m = np.asarray(hit_ndcg_at_k(scores, jnp.asarray([n - 1]), k=10))[0]
    assert m[0] == 1.0 and m[1] == 1.0


def test_mask_history_scatter():
    scores = jnp.ones((2, 5))
    hist = jnp.asarray([[1, 3, 0], [2, 0, 0]])
    out = np.asarray(mask_history(scores, hist))
    assert np.isneginf(out[0, 1]) and np.isneginf(out[0, 3])
    assert np.isneginf(out[1, 2])
    assert out[0, 2] == 1.0 and out[1, 4] == 1.0
    # padding id 0 masked too - harmless, column dropped by caller
    assert np.isneginf(out[0, 0])
