"""Reference-flag behavior: wired flags act, unsupported values raise.

VERDICT r1 (missing #2-4, weak #3): a command written for the reference
must either behave as the reference does or fail loudly — never silently
train a different model.  One test per flag:

  * item_tower='id'      -> ID pipeline (use_modal=False branches,
                            Code_Cached/run.py:39)
  * finetune_layernorm   -> tower LayerNorms trainable
                            (Code_Uncached/run.py:281-285)
  * freeze_paras_before  -> index-based tower freeze (run.py:55,99)
  * use_scale            -> AMP switch: 'half' = bf16, else fp32
                            (run.py:384)
  * is_serial='None'     -> clear error (reference's parallel-Houlsby
                            branch is itself broken, Code_Cached/run.py:212)
"""

import jax
import numpy as np
import pytest

from iisan_tpu.cli import parse_config
from iisan_tpu.config import IISANConfig
from iisan_tpu.train.peft_masks import torch_param_index, trainable_mask
from iisan_tpu.train.pipelines import effective_pipeline, validate_config


def tiny_cfg(**kw):
    base = dict(
        batch_size=8, epoch=1, embedding_dim=16,
        word_embedding_dim=32, image_embedding_dim=32,
        text_layers=2, image_layers=2,
        CV_resize=16, num_words_title=6,
        side_adapter_vit_list="0,1", side_adapter_bert_list="0,1",
        bert_adapter_down_size=8, cv_adapter_down_size=8,
        adapter_type="IISAN", adding_adapter_to="all",
        compute_dtype="float32", max_seq_len=4, min_seq_len=3)
    base.update(kw)
    return IISANConfig(**base)


def init_uncached_params(cfg):
    from iisan_tpu.train.uncached import build_uncached_model

    model, _ = build_uncached_model(cfg)
    rng = jax.random.PRNGKey(0)
    L = cfg.max_seq_len
    variables = model.init(
        {"params": rng, "dropout": rng},
        np.zeros((2, L + 1), np.int32),
        np.zeros((2 * (L + 1), cfg.CV_resize, cfg.CV_resize, 3), np.float32),
        np.zeros((2 * (L + 1), 2 * cfg.num_words_title), np.int32),
        np.zeros((2, L), np.float32),
        np.ones((22,), np.float32),
        deterministic=True,
    )
    return variables["params"]


def flat_mask(mask):
    out = {}
    for kp, v in jax.tree_util.tree_leaves_with_path(mask):
        out["/".join(str(getattr(k, "key", k)) for k in kp)] = v
    return out


# ---------------------------------------------------------------- item_tower
def test_item_tower_id_dispatches_id_pipeline():
    cfg = tiny_cfg(item_tower="id", pipeline="cached")
    assert effective_pipeline(cfg) == "id"
    cfg = tiny_cfg(item_tower="id", pipeline="uncached")
    assert effective_pipeline(cfg) == "id"
    cfg = tiny_cfg(item_tower="modal", pipeline="cached")
    assert effective_pipeline(cfg) == "cached"


def test_item_tower_unknown_value_raises():
    with pytest.raises(ValueError, match="item_tower"):
        validate_config(tiny_cfg(item_tower="bogus"))


def test_item_tower_id_runs_id_trainer(tmp_path):
    """End-to-end: a cached-pipeline command with --item_tower id trains
    the ID model (the VERDICT's exact repro of the silent-ignore bug)."""
    from iisan_tpu.train.id_pipeline import IDTrainer
    from iisan_tpu.train.pipelines import run_from_config

    rng = np.random.default_rng(0)
    items = tmp_path / "items.tsv"
    with open(items, "w") as f:
        for i in range(30):
            f.write(f"I{i:04d}\tTitle of item {i}\n")
    beh = tmp_path / "users.tsv"
    with open(beh, "w") as f:
        for u in range(15):
            n = int(rng.integers(5, 12))
            seq = " ".join(f"I{int(x):04d}" for x in
                           rng.integers(0, 30, size=n))
            f.write(f"U{u}\t{seq}\n")
    cfg = IISANConfig(
        root_data_dir=str(tmp_path), dataset="", behaviors="users.tsv",
        news="items.tsv", images="items.tsv", epoch=1, batch_size=8,
        embedding_dim=16, compute_dtype="float32", eval_batch_size=16,
        log_dir=str(tmp_path / "logs"), ckpt_dir=str(tmp_path / "ckpts"),
        pipeline="cached", item_tower="id")
    trainer, res = run_from_config(cfg)
    assert isinstance(trainer, IDTrainer)
    assert res is not None and np.isfinite(res.losses).all()


# ------------------------------------------------------- finetune_layernorm
def test_finetune_layernorm_marks_tower_layernorms_trainable():
    cfg = tiny_cfg()
    params = init_uncached_params(cfg)
    off = flat_mask(trainable_mask(params, "iisan"))
    on = flat_mask(trainable_mask(params, "iisan", finetune_layernorm=True))
    ln_paths = [p for p in on
                if ("/bert/" in p or "/vit/" in p) and "layernorm" in p.lower()]
    assert ln_paths, "no tower layernorm params found"
    for p in ln_paths:
        assert off[p] is False or off[p] == False  # noqa: E712
        assert on[p]
    # Non-LayerNorm tower params stay frozen.
    other = [p for p in on if "/bert/layer_0/intermediate/" in p]
    assert other and all(not on[p] for p in other)


# ------------------------------------------------------ freeze_paras_before
def test_torch_param_index_matches_reference_counts():
    # bert-base: last encoder tensor is index 196, so the pooler lands at
    # [197, 198] — exactly the reference's hard-coded pooler_para
    # (Code_Uncached/run.py:92).
    assert torch_param_index("text_tower/bert/word_embeddings/embedding/") == 0
    assert torch_param_index(
        "text_tower/bert/embeddings_layernorm/bias/") == 4
    assert torch_param_index(
        "text_tower/bert/layer_11/output_layernorm/bias/") == 5 + 16 * 11 + 15
    assert torch_param_index("image_tower/vit/cls_token/") == 0
    assert torch_param_index(
        "image_tower/vit/layer_0/layernorm_after/scale/") == 4 + 14
    assert torch_param_index("san/fc_bert/kernel/") == -1


def test_freeze_paras_before_freezes_prefix_in_fft():
    cfg = tiny_cfg(adapter_type="fft", adding_adapter_to="None")
    params = init_uncached_params(cfg)
    mask = flat_mask(trainable_mask(params, "fft", freeze_paras_before=5))
    # BERT embeddings (torch indices 0-4) frozen; layer_0 onward trains.
    assert not mask["text_tower/bert/word_embeddings/embedding"]
    assert not mask["text_tower/bert/embeddings_layernorm/bias"]
    assert mask["text_tower/bert/layer_0/attention/query/kernel"]
    # ViT indices 0-4: embeddings (0-3) + layer_0 query.kernel (4) frozen.
    assert not mask["image_tower/vit/cls_token"]
    assert not mask["image_tower/vit/layer_0/attention/query/kernel"]
    assert mask["image_tower/vit/layer_0/attention/query/bias"]
    # Heads unaffected.
    assert mask["text_tower/fc/kernel"]


def test_freeze_paras_before_does_not_refreeze_peft_params():
    """PEFT re-enables come after the index freeze in the reference
    (run.py:186-260 follows :55,99), so e.g. BitFit biases still train."""
    cfg = tiny_cfg(adapter_type="bitfit")
    params = init_uncached_params(cfg)
    mask = flat_mask(trainable_mask(params, "bitfit",
                                    freeze_paras_before=10 ** 6))
    assert mask["text_tower/bert/layer_0/attention/query/bias"]
    assert not mask["text_tower/bert/layer_0/attention/query/kernel"]


# ---------------------------------------------------------------- use_scale
def test_use_scale_maps_to_compute_dtype():
    assert parse_config(["--use_scale", "half"]).compute_dtype == "bfloat16"
    assert parse_config(["--use_scale", "None"]).compute_dtype == "float32"
    # Explicit --compute_dtype wins over the mapping.
    cfg = parse_config(["--use_scale", "None", "--compute_dtype", "bfloat16"])
    assert cfg.compute_dtype == "bfloat16"


def test_use_scale_unknown_value_raises():
    with pytest.raises(ValueError, match="use_scale"):
        parse_config(["--use_scale", "fp64"])


# ---------------------------------------------------------------- is_serial
def test_is_serial_none_houlsby_raises():
    with pytest.raises(ValueError, match="is_serial"):
        validate_config(tiny_cfg(adapter_type="houslby", is_serial="None"))
    # Non-houlsby methods ignore is_serial (reference only reads it there).
    validate_config(tiny_cfg(adapter_type="IISAN", is_serial="None"))


# -------------------------------------------------------------- fine_tune_to
def test_fine_tune_to_invalid_raises():
    """The reference asserts on unknown fine_tune_to (run.py:158)."""
    with pytest.raises(ValueError, match="fine_tune_to"):
        validate_config(tiny_cfg(fine_tune_to="bogus"))
    validate_config(tiny_cfg(fine_tune_to="all"))
    validate_config(tiny_cfg(fine_tune_to="None"))  # PEFT default


def test_fine_tune_to_all_with_peft_trains_towers():
    """fine_tune_to='all' is a `pass` in the reference (run.py:177-178):
    tower params keep their load-time trainability, so PEFT + 'all'
    trains towers AND adapters (minus the freeze_paras_before prefix)."""
    cfg = tiny_cfg()
    params = init_uncached_params(cfg)
    frozen = flat_mask(trainable_mask(params, "iisan"))
    assert not frozen["text_tower/bert/layer_0/intermediate/kernel"]
    mask = flat_mask(trainable_mask(params, "iisan", fine_tune_to_all=True))
    assert mask["text_tower/bert/layer_0/intermediate/kernel"]
    assert mask["image_tower/vit/layer_1/output/kernel"]
    # The index freeze still bites under 'all' (load-time state kept).
    mask5 = flat_mask(trainable_mask(params, "iisan", fine_tune_to_all=True,
                                     freeze_paras_before=5))
    assert not mask5["text_tower/bert/word_embeddings/embedding"]
    assert mask5["text_tower/bert/layer_0/attention/query/kernel"]


def test_fine_tune_to_none_without_adapters_raises():
    """Everything frozen + no adapters = nothing trains; fail loudly
    instead of reproducing the reference's silent degenerate state."""
    with pytest.raises(ValueError, match="freezes"):
        validate_config(tiny_cfg(fine_tune_to="None",
                                 adapter_type="fft",
                                 adding_adapter_to="None"))
    # ID pipeline is exempt (no towers involved).
    validate_config(tiny_cfg(fine_tune_to="None", item_tower="id",
                             adapter_type="fft", adding_adapter_to="None"))


# ------------------------------------------------------------- CV_model_load
def test_cv_model_load_non_vit_raises():
    """resnet/mae branches reference undefined encoders in the reference's
    cached trees (SURVEY 2.1 #5) — reject rather than crash later."""
    with pytest.raises(ValueError, match="CV_model_load"):
        validate_config(tiny_cfg(CV_model_load="resnet50"))
    validate_config(tiny_cfg(CV_model_load="vit"))
    validate_config(tiny_cfg(CV_model_load="resnet50", item_tower="id"))


# ------------------------------------------------------------- dropout_prng
def test_dropout_prng_validation_and_rbg_draws():
    """--dropout_prng swaps the dropout-mask PRNG (threefry -> TPU
    hardware RNG via RngBitGenerator; measured -3.6 ms/step on the
    uncached towers, PRNG_IMPL_AB.json).  Unknown impls raise; under
    'rbg' keys still draw deterministically per seed."""
    with pytest.raises(ValueError, match="dropout_prng"):
        validate_config(tiny_cfg(dropout_prng="bogus"))
    with pytest.raises(ValueError, match="dropout_prng"):
        # rejected (ADVICE r4): weaker split/fold_in independence could
        # silently correlate per-step dropout streams
        validate_config(tiny_cfg(dropout_prng="unsafe_rbg"))
    validate_config(tiny_cfg(dropout_prng="rbg"))
    assert parse_config(["--dropout_prng", "rbg"]).dropout_prng == "rbg"
    prev = jax.config.jax_default_prng_impl
    try:
        jax.config.update("jax_default_prng_impl", "rbg")
        key = jax.random.PRNGKey(0)
        a = jax.random.bernoulli(key, 0.5, (256,))
        b = jax.random.bernoulli(key, 0.5, (256,))
        assert bool((a == b).all())  # per-seed deterministic within impl
        assert 0 < int(a.sum()) < 256  # nondegenerate mask
    finally:
        jax.config.update("jax_default_prng_impl", prev)
