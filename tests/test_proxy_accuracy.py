"""Unit tests for the accuracy-proxy feature builders
(scripts/proxy_accuracy.py); the end-to-end result lives in
PROXY_ACCURACY.json."""

import sys

import numpy as np
import pytest

sys.path.insert(0, ".")

from iisan_tpu.data.synthetic import synthetic_corpus


@pytest.fixture(scope="module")
def helpers():
    from scripts.proxy_accuracy import cooc_features, lift_to_taps

    return cooc_features, lift_to_taps


def test_cooc_features_shape_and_pad(helpers):
    cooc_features, _ = helpers
    corpus = synthetic_corpus(n_users=64, item_num=120, seed=0)
    emb = cooc_features(corpus, dim=16)
    assert emb.shape == (121, 16)
    np.testing.assert_array_equal(emb[0], 0.0)   # pad item row zero
    assert np.abs(emb).max() <= 1.0 + 1e-6       # normalized
    assert np.abs(emb[1:]).sum() > 0


def test_lift_to_taps_informative_vs_random(helpers):
    cooc_features, lift_to_taps = helpers
    rng = np.random.default_rng(0)
    emb = rng.standard_normal((50, 8)).astype(np.float32)
    emb[0] = 0
    info = lift_to_taps(emb, k=3, feat_dim=32, informative=True, seed=1)
    rand = lift_to_taps(emb, k=3, feat_dim=32, informative=False, seed=1)
    assert info.shape == rand.shape == (50, 3, 32)
    np.testing.assert_array_equal(info[0], 0.0)
    np.testing.assert_array_equal(rand[0], 0.0)
    # informative taps must correlate with a projection of emb; random not.
    # (cosine similarity of tap rows for items with similar embeddings)
    a, b = 5, 7
    emb[b] = emb[a]  # force identical embeddings
    info2 = lift_to_taps(emb, k=3, feat_dim=32, informative=True, seed=1)
    sim_info = np.dot(info2[a, 0], info2[b, 0]) / (
        np.linalg.norm(info2[a, 0]) * np.linalg.norm(info2[b, 0]))
    rand2 = lift_to_taps(emb, k=3, feat_dim=32, informative=False, seed=1)
    sim_rand = np.dot(rand2[a, 0], rand2[b, 0]) / (
        np.linalg.norm(rand2[a, 0]) * np.linalg.norm(rand2[b, 0]))
    assert sim_info > sim_rand + 0.2


def test_deterministic(helpers):
    cooc_features, lift_to_taps = helpers
    corpus = synthetic_corpus(n_users=32, item_num=60, seed=0)
    e1 = cooc_features(corpus, dim=8)
    e2 = cooc_features(corpus, dim=8)
    # svds sign/order may permute columns; compare gram matrices
    np.testing.assert_allclose(e1 @ e1.T, e2 @ e2.T, atol=1e-4)
