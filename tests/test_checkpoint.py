"""Checkpoint save/resume round trip (utils.py:104-110 + run.py:234-244
capability parity: params, optimizer state, RNG, epoch)."""

import numpy as np
import pytest

from iisan_tpu.config import IISANConfig
from iisan_tpu.data.synthetic import synthetic_corpus, synthetic_taps
from iisan_tpu.train.cached import CachedTrainer
from iisan_tpu.utils.checkpoint import latest_checkpoint


def make_trainer(tmp_path, seed=12345):
    cfg = IISANConfig(
        batch_size=8, epoch=1, embedding_dim=16,
        side_adapter_vit_list="1,3", side_adapter_bert_list="1,3",
        word_embedding_dim=24, image_embedding_dim=24,
        compute_dtype="float32", eval_batch_size=16,
        ckpt_dir=str(tmp_path / "ckpt"), seed=seed)
    corpus = synthetic_corpus(n_users=16, item_num=40)
    k = len(cfg.san_image_taps())
    return CachedTrainer(cfg, corpus, synthetic_taps(40, k, 24, 1),
                         synthetic_taps(40, k, 24, 2))


def test_save_restore_roundtrip(tmp_path):
    from iisan_tpu.utils.checkpoint import (restore_checkpoint,
                                            save_checkpoint)

    tr = make_trainer(tmp_path)
    tr.run_epoch(1)
    save_checkpoint(tr.cfg.ckpt_dir, 1, {
        "params": tr.params, "opt_state": tr.opt_state,
        "rng": tr.rng, "epoch": 1})
    p_before = np.asarray(tr.params["san"]["fc_bert"]["kernel"]).copy()

    tr2 = make_trainer(tmp_path)
    epoch = tr2.resume("epoch-1")
    assert epoch == 1
    np.testing.assert_array_equal(
        np.asarray(tr2.params["san"]["fc_bert"]["kernel"]), p_before)

    # resumed training must continue deterministically vs uninterrupted run
    l_resumed = tr2.run_epoch(2)
    l_straight = tr.run_epoch(2)
    np.testing.assert_allclose(l_resumed, l_straight, rtol=1e-5)


def test_latest_checkpoint(tmp_path):
    from iisan_tpu.utils.checkpoint import save_checkpoint

    tr = make_trainer(tmp_path)
    assert latest_checkpoint(tr.cfg.ckpt_dir) is None
    for ep in (1, 3, 2):
        save_checkpoint(tr.cfg.ckpt_dir, ep, {"params": tr.params,
                                              "opt_state": tr.opt_state,
                                              "rng": tr.rng, "epoch": ep})
    assert latest_checkpoint(tr.cfg.ckpt_dir) == "epoch-3"
