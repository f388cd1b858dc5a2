"""End-to-end cached-pipeline integration test on a synthetic 13x768-style
cache (SURVEY.md section 4's suggested integration seam): trains a few
epochs, checks the loss goes down and evaluation runs."""

import jax.numpy as jnp
import numpy as np
import pytest

from iisan_tpu.config import IISANConfig
from iisan_tpu.data.synthetic import synthetic_corpus, synthetic_taps
from iisan_tpu.train.cached import CachedTrainer

pytestmark = pytest.mark.slow  # heavy e2e tier (VERDICT r1 weak #5)


def make_trainer(**cfg_kw):
    cfg = IISANConfig(
        batch_size=16, epoch=3, lr=2e-3, adapter_cv_lr=1e-3,
        adapter_bert_lr=1e-3, fine_tune_lr_image=1e-3, fine_tune_lr_text=5e-4,
        embedding_dim=16, bert_adapter_down_size=8, cv_adapter_down_size=8,
        side_adapter_vit_list="1,3", side_adapter_bert_list="1,3",
        compute_dtype="float32", eval_batch_size=32,
        word_embedding_dim=24, image_embedding_dim=24, **cfg_kw)
    corpus = synthetic_corpus(n_users=48, item_num=60)
    k = len(cfg.san_image_taps())
    cv = synthetic_taps(60, k, 24, seed=1)
    text = synthetic_taps(60, k, 24, seed=2)
    return CachedTrainer(cfg, corpus, cv, text)


def test_training_reduces_loss():
    tr = make_trainer()
    l0 = tr.run_epoch(1)
    losses = [tr.run_epoch(e) for e in range(2, 6)]
    assert np.isfinite(l0)
    assert losses[-1] < l0, f"loss did not decrease: {l0} -> {losses[-1]}"


def test_eval_pipeline_runs():
    tr = make_trainer()
    hit, ndcg = tr.evaluate_split("valid")
    assert 0.0 <= hit <= 1.0 and 0.0 <= ndcg <= 1.0
    hit_t, ndcg_t = tr.evaluate_split("test")
    assert 0.0 <= hit_t <= 1.0


def test_full_train_loop_early_stop_bookkeeping():
    tr = make_trainer()
    res = tr.train()
    assert res.epochs_run >= 1
    assert len(res.losses) == res.epochs_run
    assert res.test_metrics is not None


def test_gate_introspection():
    tr = make_trainer()
    gates = tr.gate_values()
    assert set(gates) == {"side_gate_params_text", "side_gate_params_cv",
                          "side_gate_params_mm"}
    for v in gates.values():
        np.testing.assert_allclose(v, 0.5)  # zero-init => 0.5


def test_optimizer_group_labels():
    from iisan_tpu.train.optim import param_labels
    tr = make_trainer()
    labels = param_labels(tr.params)
    flat = {}

    def walk(d, prefix=""):
        for k, v in d.items():
            if isinstance(v, dict):
                walk(v, prefix + k + "/")
            else:
                flat[prefix + k] = v

    walk(labels)
    assert flat["san/side_gate_params_cv"] == "image_tower"
    assert flat["san/side_gate_params_text"] == "recsys"
    assert flat["san/side_gate_params_mm"] == "recsys"
    assert any(k.startswith("san/bert_adapter_list") and v == "adapter_text"
               for k, v in flat.items())
    assert any(k.startswith("san/mm_adapter_list") and v == "adapter_cv"
               for k, v in flat.items())
    assert flat["san/fc_bert/kernel"] == "text_tower"
    assert flat["san/fc_cv/kernel"] == "image_tower"
    assert flat["san/cv_pre_fc/kernel"] == "recsys"
    assert all(v == "recsys" for k, v in flat.items()
               if k.startswith("user_encoder") or k.startswith("fuse"))


def test_fused_epoch_eval_matches_separate_path():
    """run_epoch_with_eval (one dispatch: train scan + item tables + eval
    scan) must reproduce run_epoch + evaluate_split exactly - losses,
    metrics, and trained params."""
    import jax.tree_util as jtu

    from iisan_tpu.config import IISANConfig
    from iisan_tpu.data.synthetic import synthetic_corpus, synthetic_taps
    from iisan_tpu.train.cached import CachedTrainer

    cfg = IISANConfig(batch_size=16, epoch=1, embedding_dim=16,
                      compute_dtype="float32", word_embedding_dim=32,
                      image_embedding_dim=32, side_adapter_vit_list="1,3",
                      side_adapter_bert_list="1,3", eval_batch_size=32)
    corpus = synthetic_corpus(n_users=70, item_num=90, seed=5)
    k = len(cfg.san_image_taps())
    cv = synthetic_taps(90, k, 32, seed=1)
    text = synthetic_taps(90, k, 32, seed=2)
    a = CachedTrainer(cfg.replace(fused_epoch_eval=False), corpus, cv, text)
    b = CachedTrainer(cfg, corpus, cv, text)
    loss_a = a.run_epoch(1)
    hit_a, ndcg_a = a.evaluate_split("valid")
    loss_b, hit_b, ndcg_b = b.run_epoch_with_eval(1)
    assert abs(loss_a - loss_b) < 1e-5
    assert abs(hit_a - hit_b) < 1e-6 and abs(ndcg_a - ndcg_b) < 1e-6
    for x, y in zip(jtu.tree_leaves(a.params), jtu.tree_leaves(b.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-5, atol=1e-6)


def test_run_epochs_matches_sequential_run_epoch():
    """run_epochs (N epochs in one dispatch, lax.scan over epochs) must
    reproduce N sequential run_epoch calls - same permutations, same RNG
    threading, same optimizer trajectory."""
    import jax.tree_util as jtu

    a = make_trainer()
    b = make_trainer()
    seq_losses = [a.run_epoch(e) for e in range(3)]
    fused_losses = b.run_epochs(0, 3)
    np.testing.assert_allclose(seq_losses, fused_losses, rtol=1e-6, atol=1e-7)
    for x, y in zip(jtu.tree_leaves(a.params), jtu.tree_leaves(b.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-6, atol=1e-7)
