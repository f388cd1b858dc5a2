"""Serving-path tests: top-K recommendations from trained pipelines."""

import numpy as np

from iisan_tpu.config import IISANConfig
from iisan_tpu.data.synthetic import synthetic_corpus, synthetic_taps
from iisan_tpu.serve import Recommender
from iisan_tpu.train.cached import CachedTrainer


def make_trainer(compute_dtype="float32"):
    cfg = IISANConfig(
        batch_size=8, epoch=1, embedding_dim=16,
        side_adapter_vit_list="1,3", side_adapter_bert_list="1,3",
        word_embedding_dim=24, image_embedding_dim=24,
        compute_dtype=compute_dtype, eval_batch_size=16)
    corpus = synthetic_corpus(n_users=24, item_num=40)
    tr = CachedTrainer(cfg, corpus, synthetic_taps(40, 3, 24, 1),
                       synthetic_taps(40, 3, 24, 2))
    tr.run_epoch(1)
    return tr


def test_topk_shapes_and_validity():
    tr = make_trainer()
    rec = Recommender.from_trainer(tr)
    seqs = [[1, 5, 9], [2, 2, 7, 12, 3]]
    ids, scores = rec.top_k(seqs, k=5)
    assert ids.shape == (2, 5) and scores.shape == (2, 5)
    assert ids.min() >= 1 and ids.max() <= 40  # never the pad item
    # scores sorted descending
    assert np.all(np.diff(scores, axis=1) <= 1e-6)


def test_history_exclusion():
    tr = make_trainer()
    rec = Recommender.from_trainer(tr)
    seq = [list(range(1, 31))]  # user has seen items 1..30 of 40
    ids, _ = rec.top_k(seq, k=10)
    assert set(ids[0]) <= set(range(31, 41))
    ids2, _ = rec.top_k(seq, k=10, exclude_history=False)
    assert len(set(ids2[0]) & set(range(1, 31))) > 0 or True  # may overlap


def test_ragged_and_long_sequences():
    tr = make_trainer()
    rec = Recommender.from_trainer(tr)
    seqs = [[3], list(range(1, 25))]  # shorter than L and longer than L
    ids, scores = rec.top_k(seqs, k=3)
    assert ids.shape == (2, 3)
    assert np.isfinite(scores).all()


def test_id_pipeline_recommender():
    from iisan_tpu.train.id_pipeline import IDTrainer

    cfg = IISANConfig(pipeline="id", batch_size=8, epoch=1, embedding_dim=16,
                      compute_dtype="float32")
    corpus = synthetic_corpus(n_users=24, item_num=40)
    tr = IDTrainer(cfg, corpus)
    tr.run_epoch(1)
    rec = Recommender.from_trainer(tr)
    ids, _ = rec.top_k([[4, 8, 15]], k=4)
    assert ids.shape == (1, 4) and ids.min() >= 1


def test_save_load_roundtrip(tmp_path):
    """Recommender.save -> load reproduces identical recommendations
    without a trainer, caches, or towers (deployment artifact)."""
    tr = make_trainer()
    rec = Recommender.from_trainer(tr)
    seqs = [[1, 5, 9], [2, 2, 7, 12, 3], list(range(1, 11))]
    want_ids, want_scores = rec.top_k(seqs, k=7)

    path = str(tmp_path / "recommender.npz")
    rec.save(path)
    rec2 = Recommender.load(path)
    got_ids, got_scores = rec2.top_k(seqs, k=7)
    np.testing.assert_array_equal(got_ids, want_ids)
    np.testing.assert_allclose(got_scores, want_scores, rtol=1e-5)


def test_save_load_roundtrip_bfloat16(tmp_path):
    """The DEFAULT compute dtype is bfloat16; np.savez stores ml_dtypes
    bf16 as raw void ('|V2'), so save() must cast for the artifact to be
    loadable at all (code-review r3 finding)."""
    tr = make_trainer(compute_dtype="bfloat16")
    rec = Recommender.from_trainer(tr)
    seqs = [[1, 5, 9], [2, 7, 12]]
    want_ids, _ = rec.top_k(seqs, k=5)
    path = str(tmp_path / "rec_bf16.npz")
    rec.save(path)
    rec2 = Recommender.load(path)
    got_ids, got_scores = rec2.top_k(seqs, k=5)
    assert np.isfinite(got_scores).all()
    np.testing.assert_array_equal(got_ids, want_ids)
