"""CLI + pipeline-orchestration tests on miniature TSV datasets."""

import json
import os

import numpy as np
import pytest

from iisan_tpu.cli import parse_config
from iisan_tpu.config import IISANConfig
from iisan_tpu.data.cache_store import HiddenStateCache
from iisan_tpu.data import preprocess as prep


@pytest.fixture()
def tiny_dataset(tmp_path):
    """items + behaviors TSVs in the reference format (SURVEY.md #20)."""
    rng = np.random.default_rng(0)
    n_items, n_users = 30, 15
    items = tmp_path / "items.tsv"
    with open(items, "w") as f:
        for i in range(n_items):
            f.write(f"I{i:04d}\tTitle of item {i}\n")
    beh = tmp_path / "users.tsv"
    with open(beh, "w") as f:
        for u in range(n_users):
            n = int(rng.integers(5, 12))
            seq = " ".join(f"I{int(x):04d}" for x in
                           rng.integers(0, n_items, size=n))
            f.write(f"U{u}\t{seq}\n")
    return tmp_path


def base_cfg(tiny_dataset, **kw):
    return IISANConfig(
        root_data_dir=str(tiny_dataset), dataset="", behaviors="users.tsv",
        news="items.tsv", images="items.tsv", epoch=2, batch_size=8,
        embedding_dim=16, side_adapter_vit_list="1,3",
        side_adapter_bert_list="1,3", compute_dtype="float32",
        eval_batch_size=16, log_dir=str(tiny_dataset / "logs"),
        ckpt_dir=str(tiny_dataset / "ckpts"), **kw)


def test_cli_flag_names_match_reference():
    cfg = parse_config([
        "--mode", "train", "--item_tower", "modal", "--batch_size", "64",
        "--lr", "2e-4", "--embedding_dim", "64",
        "--side_adapter_vit_list", "1,3,5,7,9,11",
        "--side_adapter_bert_list", "1,3,5,7,9,11",
        "--fusion_method", "gated", "--modality", "intra_inter",
        "--stored_vector_path", "/tmp/x", "--seed", "12345",
        "--adapter_cv_lr", "1e-4", "--bert_adapter_down_size", "64",
        "--remove_first", "None", "--adding_adapter_to", "all",
        "--fine_tune_to", "None", "--adapter_type", "IISAN",
        "--cached_text_model", "llama70b_GPTQ_embeddings",
        "--text_embedding_dim", "8192", "--text_layers", "80",
    ])
    assert cfg.batch_size == 64 and cfg.lr == 2e-4
    assert cfg.san_text_taps() == (0, 2, 4, 6, 8, 10, 12)
    assert cfg.text_embedding_dim == 8192 and cfg.text_layers == 80
    assert cfg.cached_text_model == "llama70b_GPTQ_embeddings"
    # with_bert_dims coupling (run.py:64-78)
    assert cfg.word_embedding_dim == 768


def test_etl_on_reference_format(tiny_dataset):
    titles, n2i, i2n = prep.read_items(str(tiny_dataset / "items.tsv"))
    assert len(titles) == 30
    corpus = prep.read_behaviors(str(tiny_dataset / "users.tsv"), n2i, i2n,
                                 10, 5)
    assert corpus.n_users > 0
    assert corpus.train_seqs.shape[1] == 11
    # pop_prob: pad prob 1 prepended, rest sums to 1 (preprocess.py:77-82)
    assert corpus.pop_prob[0] == 1.0
    np.testing.assert_allclose(corpus.pop_prob[1:].sum(), 1.0, rtol=1e-5)
    # leave-one-out: valid target != test target for long seqs
    assert corpus.valid_target.min() >= 1
    # histories contain only positive ids and zeros
    assert corpus.valid_history.min() >= 0


def test_cached_pipeline_from_config(tiny_dataset):
    from iisan_tpu.train.pipelines import run_from_config

    cfg = base_cfg(tiny_dataset, pipeline="cached",
                   stored_vector_path=str(tiny_dataset / "vecs"))
    # pre-build tiny caches in the memmap layout
    titles, n2i, i2n = prep.read_items(str(tiny_dataset / "items.tsv"))
    corpus = prep.read_behaviors(str(tiny_dataset / "users.tsv"), n2i, i2n,
                                 cfg.max_seq_len, cfg.min_seq_len)
    n = corpus.item_num + 1
    rng = np.random.default_rng(1)
    for sub in ("bert_outputs", "vit_outputs"):
        store = HiddenStateCache.create(
            os.path.join(cfg.stored_vector_path, sub + ".memmap"),
            n, 13, 32, "float32")
        store.write_rows(1, rng.standard_normal((n - 1, 13, 32)).astype("float32"))
        store.flush()
    cfg = cfg.replace(word_embedding_dim=32, image_embedding_dim=32)
    trainer, res = run_from_config(cfg)
    assert res is not None and res.epochs_run >= 1
    assert np.isfinite(res.losses).all()


def test_orchestrated_run_saves_and_resumes_checkpoints(tiny_dataset):
    """run_from_config must persist checkpoints the --load_ckpt_name resume
    path can consume (VERDICT r1 missing #3; Code_Cached/run.py:402-405)."""
    import jax

    from iisan_tpu.train.pipelines import run_from_config
    from iisan_tpu.utils.checkpoint import latest_checkpoint

    cfg = base_cfg(tiny_dataset, pipeline="id")
    trainer, res = run_from_config(cfg)
    latest = latest_checkpoint(cfg.ckpt_dir)
    assert latest is not None, "orchestrated run wrote no checkpoints"

    # Fresh orchestrated run resuming from the saved checkpoint with no
    # further epochs: its params must be bit-identical to the saved state.
    from iisan_tpu.utils.checkpoint import restore_checkpoint

    cfg2 = cfg.replace(load_ckpt_name=latest, epoch=0)
    trainer2, _ = run_from_config(cfg2)
    want, saved_epoch = restore_checkpoint(
        cfg.ckpt_dir, latest,
        {"params": trainer2.params, "opt_state": trainer2.opt_state,
         "rng": trainer2.rng, "epoch": 0})
    for a, b in zip(jax.tree_util.tree_leaves(trainer2.params),
                    jax.tree_util.tree_leaves(want["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # And with epochs remaining, training continues past the saved epoch.
    cfg3 = cfg.replace(load_ckpt_name=latest, epoch=1)
    _, res3 = run_from_config(cfg3)
    assert res3.epochs_run == saved_epoch + 1


def test_id_pipeline_from_config(tiny_dataset):
    from iisan_tpu.train.pipelines import run_from_config

    cfg = base_cfg(tiny_dataset, pipeline="id")
    trainer, res = run_from_config(cfg)
    assert res.epochs_run >= 1


def test_id_pipeline_without_items_tsv(tiny_dataset, tmp_path):
    """Office-shape dataset (behaviors only, .MISSING_LARGE_BLOBS): the
    title-free ID pipeline synthesizes its item registry from behaviors;
    a titles-needing pipeline still fails loudly on the missing TSV."""
    import shutil

    import pytest

    from iisan_tpu.train.pipelines import run_from_config

    ds = tmp_path / "behaviors_only"
    ds.mkdir()
    shutil.copy(tiny_dataset / "users.tsv", ds / "users.tsv")

    cfg = base_cfg(ds, pipeline="id")
    trainer, res = run_from_config(cfg)
    assert res.epochs_run >= 1 and np.isfinite(res.losses).all()

    with pytest.raises(FileNotFoundError):
        run_from_config(base_cfg(ds, pipeline="uncached"))


def test_sweep_dry_run(tiny_dataset):
    from iisan_tpu.sweep import expand_grid, run_sweep

    grid = expand_grid({"lr": [1e-4, 2e-4], "seed": [1, 2, 3]})
    assert len(grid) == 6
    res = run_sweep({"pipeline": "id"}, {"lr": [1e-4, 2e-4]}, dry_run=True)
    assert len(res) == 2


def test_tpme_scores():
    from iisan_tpu.utils.tpme import RunRecord, tpme_scores

    recs = [
        RunRecord("fft", 443.0, 194_000_000, 47 << 30),
        RunRecord("iisan_cached", 22.0, 4_000_000, 3 << 30),
        RunRecord("lora", 380.0, 5_000_000, 39 << 30),
    ]
    scores = tpme_scores(recs)
    # FFT is worst on every axis -> TPME 1.0; cached IISAN best -> 0.0
    assert scores["fft"] == pytest.approx(1.0)
    assert scores["iisan_cached"] == pytest.approx(0.0)
    assert 0 < scores["lora"] < 1


def test_optimizer_labels_for_uncached_tower_paths():
    """run.py:296-316's group membership for the REAL Flax tree paths:
    tower weights at fine-tune lrs, in-tower LoRA/Houlsby at adapter lrs,
    replaced heads in recsys (previously every tower param silently fell
    to recsys and trained at the wrong lr)."""
    from iisan_tpu.train.optim import label_for_path

    assert label_for_path(
        "text_tower/bert/layer_0/attention/query/kernel") == "text_tower"
    assert label_for_path(
        "image_tower/vit/layer_3/intermediate/kernel") == "image_tower"
    assert label_for_path(
        "text_tower/bert/layer_0/attention/query/lora_A") == "adapter_text"
    assert label_for_path(
        "image_tower/vit/layer_1/attention/value/lora_B") == "adapter_cv"
    assert label_for_path(
        "text_tower/bert/layer_0/attention_adapter/fc_down/kernel"
    ) == "adapter_text"
    assert label_for_path(
        "image_tower/vit/layer_0/output_adapter/fc_up/bias") == "adapter_cv"
    # replaced heads: title fc / ViT classifier -> recsys (the
    # 'fc'-without-'fc_' / 'classifier' rules, run.py:299,308)
    assert label_for_path("text_tower/fc/kernel") == "recsys"
    assert label_for_path("image_tower/classifier/bias") == "recsys"
    # BitFit tower biases stay in the tower groups
    assert label_for_path(
        "text_tower/bert/layer_1/intermediate/bias") == "text_tower"
    # cached-tree labels unchanged
    assert label_for_path("san/bert_adapter_list_wd") == "adapter_text"
    assert label_for_path("san/side_gate_params_cv") == "image_tower"
    assert label_for_path("user_encoder/transformer_encoder/layer_norm/"
                          "scale") == "recsys"


def test_tpme_scores_missing_memory_is_neutral():
    """A record without memory stats must not score 0 (= best) and
    inflate every other run's 0.45-weighted memory term."""
    from iisan_tpu.utils.tpme import RunRecord, tpme_scores

    def rec(label, t, p, m):
        r = RunRecord(label=label, epoch_seconds=t, trainable_params=p,
                      peak_memory_bytes=m)
        return r

    a = rec("a", 10.0, 1000, 1 * 2**30)
    b = rec("b", 20.0, 2000, 2 * 2**30)
    c = rec("c", 15.0, 1500, None)          # unmeasured memory
    scores = tpme_scores([a, b, c])
    # measured pair unaffected by c's presence
    scores_ab = tpme_scores([a, b])
    assert abs(scores["a"] - scores_ab["a"]) < 1e-9
    assert abs(scores["b"] - scores_ab["b"]) < 1e-9
    # c's memory term is the mean of the measured normalized values (0.5
    # here), not 0
    import numpy as np

    from iisan_tpu.utils.tpme import ALPHA

    t_c, p_c = 0.5, 0.5
    assert abs(scores["c"] - (ALPHA[0] * t_c + ALPHA[1] * p_c
                              + ALPHA[2] * 0.5)) < 1e-9


def test_sweep_label_sanitizes_path_values(tmp_path, monkeypatch):
    """Sweeping a path-like value (dataset=Dataset/Scientific) must not
    put separators into the log filename."""
    from iisan_tpu import sweep as sweep_mod

    seen = []

    def fake_run(cfg, eval_only=False):
        seen.append(cfg.label_screen)
        return None, None

    monkeypatch.setattr("iisan_tpu.train.pipelines.run_from_config",
                        fake_run)
    sweep_mod.run_sweep({}, {"dataset": ["Dataset/Scientific"]},
                        dry_run=False)
    assert seen and "/" not in seen[0]
