"""Train-loop behavior tests: NaN abort, early stop, non-gated fusion."""

import numpy as np

from iisan_tpu.config import IISANConfig
from iisan_tpu.data.synthetic import synthetic_corpus, synthetic_taps
from iisan_tpu.train.cached import CachedTrainer


def make_trainer(**kw):
    # fused_epoch_eval off: these tests monkeypatch run_epoch /
    # evaluate_split, which the fused single-dispatch path bypasses (the
    # fused path itself is covered by test_cached_e2e.py).
    kw.setdefault("epoch", 5)
    cfg = IISANConfig(
        batch_size=8, embedding_dim=16,
        side_adapter_vit_list="1,3", side_adapter_bert_list="1,3",
        word_embedding_dim=24, image_embedding_dim=24,
        compute_dtype="float32", eval_batch_size=16,
        fused_epoch_eval=False, **kw)
    corpus = synthetic_corpus(n_users=24, item_num=40)
    k = len(cfg.san_image_taps())
    return CachedTrainer(cfg, corpus, synthetic_taps(40, k, 24, 1),
                         synthetic_taps(40, k, 24, 2))


def test_nan_loss_aborts_training(monkeypatch):
    tr = make_trainer()
    calls = []

    def bad_epoch(epoch):
        calls.append(epoch)
        return float("nan")

    monkeypatch.setattr(tr, "run_epoch", bad_epoch)
    res = tr.train()
    assert len(calls) == 1  # stopped immediately (run.py:387-389 analog)
    assert res.epochs_run == 0


def test_early_stop_patience(monkeypatch):
    tr = make_trainer(early_stop_patience=2)
    monkeypatch.setattr(tr, "run_epoch", lambda e: 1.0)
    # metrics never improve after the first eval
    vals = iter([0.5] + [0.1] * 50)
    monkeypatch.setattr(tr, "evaluate_split",
                        lambda split: (next(vals), 0.0)
                        if split == "valid" else (0.0, 0.0))
    res = tr.train()
    # 1 best epoch + patience(2)+1 failing epochs
    assert res.epochs_run == 4
    assert res.best_epoch == 1


def test_best_test_metrics_taken_at_best_valid_epoch(monkeypatch):
    """best_test_metrics must be the test eval at the best-VALID epoch,
    while test_metrics mirrors the reference's literal last-test-run
    behavior (every-10th-epoch rule can overwrite it, run.py:402-405)."""
    tr = make_trainer(epoch=12, early_stop_patience=20)
    monkeypatch.setattr(tr, "run_epoch", lambda e: 1.0)
    # valid peaks at epoch 2 then declines; test eval returns the epoch
    # number so we can see WHICH epoch's test eval was recorded.
    valid = iter([0.5, 0.9] + [0.1] * 50)
    state = {"ep": 0}

    def fake_eval(split):
        if split == "valid":
            state["ep"] += 1
            return (next(valid), 0.0)
        return (float(state["ep"]), 0.0)

    monkeypatch.setattr(tr, "evaluate_split", fake_eval)
    res = tr.train()
    assert res.best_epoch == 2
    assert res.best_test_metrics == (2.0, 0.0)
    # the every-10th-epoch rule ran a later test eval (epoch 11: ep%10==0)
    assert res.test_metrics == (11.0, 0.0)


def test_additive_fusion_end_to_end():
    """fusion_method != gated: additive intra fusion (model.py:328-330);
    no intra gate params are created."""
    tr = make_trainer(fusion_method="add")
    assert "side_gate_params_text" not in tr.params["san"]
    assert "side_gate_params_mm" in tr.params["san"]  # inter stays gated
    loss = tr.run_epoch(1)
    assert np.isfinite(loss)
