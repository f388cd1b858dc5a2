"""IISAN-Versa (cached_asym) pipeline from config: asymmetric dims, uneven
tap lists (group layer-drop), per-modality cache stores with custom
cached_* names (Code_Cached_Asym/parameters.py:72-75)."""

import os

import numpy as np
import pytest

from iisan_tpu.config import IISANConfig
from iisan_tpu.data import preprocess as prep
from iisan_tpu.data.cache_store import HiddenStateCache


@pytest.fixture()
def tiny_dataset(tmp_path):
    rng = np.random.default_rng(0)
    with open(tmp_path / "items.tsv", "w") as f:
        for i in range(25):
            f.write(f"X{i:03d}\tversa item {i}\n")
    with open(tmp_path / "users.tsv", "w") as f:
        for u in range(12):
            n = int(rng.integers(5, 12))
            seq = " ".join(f"X{int(x):03d}" for x in
                           rng.integers(0, 25, size=n))
            f.write(f"U{u}\t{seq}\n")
    return tmp_path


def test_cached_asym_from_config(tiny_dataset):
    from iisan_tpu.train.pipelines import run_from_config

    cfg = IISANConfig(
        pipeline="cached_asym",
        root_data_dir=str(tiny_dataset), dataset="", behaviors="users.tsv",
        news="items.tsv", images="items.tsv",
        stored_vector_path=str(tiny_dataset / "vecs"),
        epoch=2, batch_size=8, embedding_dim=16,
        # llama-like: deep/wide text (9 layers x 48), tiny image (5 x 24)
        text_layers=8, text_embedding_dim=48,
        image_layers=4, image_embedding_dim=24,
        side_adapter_bert_list="1,3,5,7", side_adapter_vit_list="1,3",
        cached_text_model="llama_embeddings", cached_text_prefix="llama",
        cached_image_model="vit_tiny_outputs", cached_image_prefix="vit",
        compute_dtype="float32", eval_batch_size=16,
        log_dir=str(tiny_dataset / "logs"),
        ckpt_dir=str(tiny_dataset / "ckpts"))

    titles, n2i, i2n = prep.read_items(str(tiny_dataset / "items.tsv"))
    corpus = prep.read_behaviors(str(tiny_dataset / "users.tsv"), n2i, i2n,
                                 cfg.max_seq_len, cfg.min_seq_len)
    n = corpus.item_num + 1
    rng = np.random.default_rng(1)
    for sub, layers, dim in [("llama_embeddings", 9, 48),
                             ("vit_tiny_outputs", 5, 24)]:
        st = HiddenStateCache.create(
            os.path.join(cfg.stored_vector_path, sub + ".memmap"),
            n, layers, dim, "float32")
        st.write_rows(1, rng.standard_normal((n - 1, layers, dim))
                      .astype("float32"))
        st.flush()

    trainer, res = run_from_config(cfg)
    assert res.epochs_run >= 1 and np.isfinite(res.losses).all()
    # group layer-drop geometry: 5 text fusion steps vs 3 image
    assert trainer.model.san.num_text_taps == 5
    assert trainer.model.san.num_image_taps == 3
    gates = trainer.gate_values()
    assert gates["side_gate_params_text"].shape == (5,)
    assert gates["side_gate_params_mm"].shape == (3,)
    # dim-transform alignment params exist (text wider than image)
    assert "down_project_list_0" in trainer.params["san"]
