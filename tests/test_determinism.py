"""Seed determinism (the reference's setup_seed + worker-seed plumbing,
run.py:465-472,126-130, reduces to explicit key/permutation seeding here):
identical seeds reproduce identical trajectories; different seeds differ."""

import numpy as np

from iisan_tpu.config import IISANConfig
from iisan_tpu.data.synthetic import synthetic_corpus, synthetic_taps
from iisan_tpu.train.cached import CachedTrainer


def make(seed):
    cfg = IISANConfig(
        batch_size=8, epoch=2, embedding_dim=16,
        side_adapter_vit_list="1,3", side_adapter_bert_list="1,3",
        word_embedding_dim=24, image_embedding_dim=24,
        compute_dtype="float32", eval_batch_size=16, seed=seed)
    corpus = synthetic_corpus(n_users=24, item_num=40)
    return CachedTrainer(cfg, corpus, synthetic_taps(40, 3, 24, 1),
                         synthetic_taps(40, 3, 24, 2))


def test_same_seed_reproduces():
    l1 = [make(7).run_epoch(e) for e in (1,)]
    l2 = [make(7).run_epoch(e) for e in (1,)]
    np.testing.assert_array_equal(l1, l2)


def test_different_seed_differs():
    assert make(7).run_epoch(1) != make(8).run_epoch(1)


def test_uncached_gate_introspection():
    from iisan_tpu.data.images import SyntheticImageStore
    from iisan_tpu.train.uncached import UncachedTrainer

    cfg = IISANConfig(
        batch_size=4, epoch=1, embedding_dim=16,
        word_embedding_dim=32, image_embedding_dim=32,
        text_layers=2, image_layers=2, CV_resize=16, num_words_title=6,
        side_adapter_vit_list="0,1", side_adapter_bert_list="0,1",
        bert_adapter_down_size=8, cv_adapter_down_size=8,
        adapter_type="IISAN", adding_adapter_to="all",
        fine_tune_to="None",
        compute_dtype="float32", max_seq_len=4, min_seq_len=3)
    corpus = synthetic_corpus(n_users=8, item_num=15, max_seq_len=4,
                              min_seq_len=3)
    tokens = np.zeros((16, 12), np.int32)
    tokens[:, 6:] = 1
    tr = UncachedTrainer(cfg, corpus, tokens, SyntheticImageStore(16))
    gates = tr.gate_values()
    assert set(gates) == {"side_gate_params_text", "side_gate_params_cv",
                          "side_gate_params_mm"}
