"""Baseline PEFT sweeps (uncached, Amazon Scientific).

Canonical grids of /root/reference/Code_Uncached/scripts/run_{fft,lora,
adapter,bitfit}.py: FFT bs 32 lr 1e-4; LoRA r=bert_adapter_down (8) adapter
lr 4e-4; Houlsby adapter 64 lr 4e-4; BitFit bias-only - all with
fine_tune_lr_image 1e-4 / fine_tune_lr_text 5e-5, emb 64, 100 epochs.

    python scripts/run_baselines.py fft|lora|houlsby|bitfit
"""

import sys

sys.path.insert(0, ".")
from iisan_tpu.sweep import run_sweep

COMMON = dict(
    pipeline="uncached",
    root_data_dir="/root/reference",
    dataset="Dataset/Scientific",
    behaviors="am_Industrial_and_Scientific_users.tsv",
    images="Industrial_and_Scientific_items.tsv",
    news="Industrial_and_Scientific_items.tsv",
    lmdb_data="am_is.lmdb",
    mode="train",
    epoch=100,
    freeze_paras_before=0,
    CV_model_load="vit",
    bert_model_load="bert_base_uncased",
)

METHODS = {
    # run_fft.py: full fine-tune, bs 32, user lr 1e-4
    "fft": (dict(adapter_type="fft", adding_adapter_to="None",
                 fine_tune_to="all"),
            dict(batch_size=[32], lr=[1e-4], embedding_dim=[64],
                 fine_tune_lr_image=[1e-4], fine_tune_lr_text=[5e-5],
                 drop_rate=[0.1], seed=[12345])),
    # run_lora.py: r=8 on q/v, adapter lrs 4e-4, user lr 2e-4
    "lora": (dict(adapter_type="lora", adding_adapter_to="all",
                  fine_tune_to="None", bert_adapter_down_size=8,
                  cv_adapter_down_size=8),
             dict(batch_size=[32], lr=[2e-4], embedding_dim=[64],
                  adapter_cv_lr=[4e-4], adapter_bert_lr=[4e-4],
                  fine_tune_lr_image=[1e-4], fine_tune_lr_text=[5e-5],
                  drop_rate=[0.1], seed=[12345])),
    # run_adapter.py: Houlsby 64, adapter lrs 4e-4
    "houlsby": (dict(adapter_type="houslby", adding_adapter_to="all",
                     fine_tune_to="None", bert_adapter_down_size=64,
                     cv_adapter_down_size=64, is_serial="True"),
                dict(batch_size=[32], lr=[2e-4], embedding_dim=[64],
                     adapter_cv_lr=[4e-4], adapter_bert_lr=[4e-4],
                     fine_tune_lr_image=[1e-4], fine_tune_lr_text=[5e-5],
                     drop_rate=[0.1], seed=[12345])),
    # run_bitfit.py: bias-only
    "bitfit": (dict(adapter_type="bitfit", adding_adapter_to="all",
                    fine_tune_to="None"),
               dict(batch_size=[32], lr=[2e-4], embedding_dim=[64],
                    fine_tune_lr_image=[1e-4], fine_tune_lr_text=[5e-5],
                    drop_rate=[0.1], seed=[12345])),
}

if __name__ == "__main__":
    method = sys.argv[1] if len(sys.argv) > 1 else "fft"
    base, grid = METHODS[method]
    run_sweep({**COMMON, **base}, grid)
