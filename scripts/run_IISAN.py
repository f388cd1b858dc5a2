"""Canonical IISAN (Cached) sweep.

Hyperparameter grid of /root/reference/Code_Cached/scripts/run_IISAN.py:
27-49 (the published headline config): bs 64, lr 2e-4, adapter lrs 1e-4,
emb/adapter-down 64, SAN layers "1,3,5,7,9,11", gated intra_inter,
seed 12345, 100 epochs.

    python scripts/run_IISAN.py [scientific|instrument|office|micro]

replaces the reference's per-dataset launcher copies (run_IISAN_ins.py /
run_IISAN_off.py / run_IISAN_micro.py differ only in the lines the
dataset registry captures).
"""

import sys

sys.path.insert(0, ".")
from iisan_tpu.sweep import run_sweep
from scripts.datasets import DATASETS

BASE = dict(
    pipeline="cached",
    root_data_dir="/root/reference",
    stored_vector_path="./stored_vectors_sci",
    mode="train",
    item_tower="modal",
    epoch=100,
    adapter_type="IISAN",
    adding_adapter_to="all",
    fine_tune_to="None",
    side_adapter_vit_list="1,3,5,7,9,11",
    side_adapter_bert_list="1,3,5,7,9,11",
    side_adapter_mm_list="1,3,5,7,9,11",
    modality="intra_inter",
    fusion_method="gated",
    CV_model_load="vit",
    bert_model_load="bert_base_uncased",
    logging_num=4,
    testing_num=1,
)

GRID = dict(
    embedding_dim=[64],
    batch_size=[64],
    lr=[2e-4],
    adapter_cv_lr=[1e-4],
    adapter_bert_lr=[1e-4],
    fine_tune_lr_image=[1e-4],
    fine_tune_lr_text=[5e-5],
    cv_adapter_down_size=[64],
    bert_adapter_down_size=[64],
    drop_rate=[0.1],
    l2_weight=[0],
    seed=[12345],
)

if __name__ == "__main__":
    name = sys.argv[1] if len(sys.argv) > 1 else "scientific"
    run_sweep({**BASE, **DATASETS[name],
               "stored_vector_path": f"./stored_vectors_{name}"}, GRID)
