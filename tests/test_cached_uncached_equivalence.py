"""Cached == Uncached end-to-end equivalence (VERDICT r1, top item).

The defining invariant of the reference: training on precomputed
hidden-state caches is the SAME model as running the frozen towers
in-graph — Code_Cached/model/model.py:301-302's tensor slicing must equal
Code_Uncached/model/model.py:209-213's tower outputs.  This test builds
text+image caches from the in-framework random-weight towers via
cache_builder, grafts the uncached trainer's trainable params into a
CachedTrainer, and asserts the two pipelines produce the same per-step
losses over an epoch.  It fails if tap indexing, head wiring, CLS
selection, or normalization ever diverges between the pipelines.

Determinism requirements: fp32 compute, all dropout rates 0 (the
reference trains its BERT tower un-eval()ed with dropout 0.1, which makes
the pipelines agree only in expectation; tower_dropout=0 closes that),
and full-length user sequences (pad items embed as zeros in cached mode
but as a zero-image tower forward in uncached mode — a true reference
behavior difference that only touches pad columns).
"""

import numpy as np
import pytest

from iisan_tpu.cache_builder import build_image_cache, build_text_cache
from iisan_tpu.config import IISANConfig
from iisan_tpu.data.images import SyntheticImageStore
from iisan_tpu.data.synthetic import synthetic_corpus
from iisan_tpu.train.cached import CachedTrainer
from iisan_tpu.train.uncached import UncachedTrainer

L = 4  # max_seq_len


def equiv_cfg(**kw):
    base = dict(
        pipeline="uncached", batch_size=8, epoch=1, embedding_dim=16,
        word_embedding_dim=32, image_embedding_dim=32,
        text_layers=2, image_layers=2,
        CV_resize=16, num_words_title=6,
        side_adapter_vit_list="0,1", side_adapter_bert_list="0,1",
        bert_adapter_down_size=8, cv_adapter_down_size=8,
        adapter_type="IISAN", adding_adapter_to="all",
        fine_tune_to="None",
        compute_dtype="float32", max_seq_len=L, min_seq_len=3,
        drop_rate=0.0, adapter_dropout_rate=0.0, tower_dropout=0.0,
        fused_tower_attention=False, fused_user_encoder=False)
    base.update(kw)
    return IISANConfig(**base)


def full_length_corpus(n_users=16, item_num=24, seed=3):
    """Every train sequence full (L+1 items, log_mask all ones): no pad
    ids ever enter a train batch, the one place the reference pipelines
    legitimately differ (see module docstring)."""
    c = synthetic_corpus(n_users=n_users, item_num=item_num,
                         max_seq_len=L, min_seq_len=L + 3, seed=seed)
    assert (c.train_seqs > 0).all() and (c.train_log_mask == 1).all()
    return c


def build_both_trainers(tmp_path, cfg, n_epochs=1):
    corpus = full_length_corpus()
    rng = np.random.default_rng(0)
    nw = cfg.num_words_title
    tokens = np.zeros((corpus.item_num + 1, 2 * nw), np.int32)
    tokens[1:, :nw] = rng.integers(1, 99, size=(corpus.item_num, nw))
    tokens[1:, nw:] = 1
    store = SyntheticImageStore(cfg.CV_resize)

    uc = UncachedTrainer(cfg, corpus, tokens, store)

    # Caches from the SAME tower params the uncached model runs in-graph
    # (preprocess_vectors.py's contract, via our cache_builder).
    bert = uc.model.text_tower.bert
    vit = uc.model.image_tower.vit
    text_cache = build_text_cache(
        bert, uc.params["text_tower"]["bert"], tokens,
        str(tmp_path / "text"), batch=8, dtype="float32")
    image_cache = build_image_cache(
        vit, uc.params["image_tower"]["vit"], corpus.item_names, store,
        str(tmp_path / "image"), resize=cfg.CV_resize, batch=8,
        dtype="float32")

    ccfg = cfg.replace(pipeline="cached")
    ct = CachedTrainer(ccfg, corpus,
                       image_cache.load_taps(cfg.san_image_taps()),
                       text_cache.load_taps(cfg.san_text_taps()))
    # Same starting point: the trainable subtrees are module-identical
    # across pipelines; copy them from the uncached init (flax's param
    # folding differs per module path, so independent inits differ).
    # deep copy: both trainers' steps donate their param buffers, so the
    # trees must not alias (donated buffers are deleted by XLA)
    import jax
    import jax.numpy as jnp

    ct.params = jax.tree_util.tree_map(
        jnp.array, {k: uc.params[k] for k in ("san", "user_encoder",
                                              "fuse")})
    ct.opt_state = ct.tx.init(ct.params)
    return uc, ct


def test_cached_equals_uncached_per_step_losses(tmp_path):
    cfg = equiv_cfg()
    uc, ct = build_both_trainers(tmp_path, cfg)
    for epoch in range(2):
        loss_u = uc.run_epoch(epoch)
        loss_c = ct.run_epoch(epoch)
        lu = np.asarray(uc._last_step_losses)
        lc = np.asarray(ct._last_step_losses)
        assert lu.shape == lc.shape and lu.shape[0] >= 2
        np.testing.assert_allclose(lc, lu, rtol=5e-5, atol=5e-5)
        assert np.isfinite(loss_u) and np.isfinite(loss_c)
    # And the trained params agree after two epochs of updates.
    import jax

    for (kp_u, a), (kp_c, b) in zip(
            jax.tree_util.tree_leaves_with_path(
                {k: uc.params[k] for k in ("san", "user_encoder", "fuse")}),
            jax.tree_util.tree_leaves_with_path(ct.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=str(kp_u))


def test_equivalence_catches_tap_misindexing(tmp_path):
    """Sanity that the test has teeth: shifting the cached tap rows by one
    layer must break the per-step match."""
    cfg = equiv_cfg()
    corpus = full_length_corpus()
    rng = np.random.default_rng(0)
    nw = cfg.num_words_title
    tokens = np.zeros((corpus.item_num + 1, 2 * nw), np.int32)
    tokens[1:, :nw] = rng.integers(1, 99, size=(corpus.item_num, nw))
    tokens[1:, nw:] = 1
    store = SyntheticImageStore(cfg.CV_resize)
    uc = UncachedTrainer(cfg, corpus, tokens, store)
    text_cache = build_text_cache(
        uc.model.text_tower.bert, uc.params["text_tower"]["bert"], tokens,
        str(tmp_path / "text"), batch=8, dtype="float32")
    image_cache = build_image_cache(
        uc.model.image_tower.vit, uc.params["image_tower"]["vit"],
        corpus.item_names, store, str(tmp_path / "image"),
        resize=cfg.CV_resize, batch=8, dtype="float32")

    wrong_taps = tuple(min(i + 1, cfg.text_layers)
                       for i in cfg.san_text_taps())  # off-by-one layer
    ct = CachedTrainer(cfg.replace(pipeline="cached"), corpus,
                       image_cache.load_taps(cfg.san_image_taps()),
                       text_cache.load_taps(wrong_taps))
    import jax
    import jax.numpy as jnp

    ct.params = jax.tree_util.tree_map(
        jnp.array, {k: uc.params[k] for k in ("san", "user_encoder",
                                              "fuse")})
    ct.opt_state = ct.tx.init(ct.params)
    uc.run_epoch(0)
    ct.run_epoch(0)
    lu = np.asarray(uc._last_step_losses)
    lc = np.asarray(ct._last_step_losses)
    with pytest.raises(AssertionError):
        np.testing.assert_allclose(lc, lu, rtol=5e-5, atol=5e-5)
