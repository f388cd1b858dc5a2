"""Quickstart: the full iisan_tpu workflow in one small script.

Runs in under a minute on CPU (or any single accelerator) with synthetic
data; swap in real TSVs/caches as shown in the comments for production.

    python examples/quickstart.py
"""

import sys

sys.path.insert(0, ".")

import numpy as np

from iisan_tpu.config import IISANConfig
from iisan_tpu.data.synthetic import synthetic_corpus, synthetic_taps
from iisan_tpu.serve import Recommender
from iisan_tpu.train.cached import CachedTrainer
from iisan_tpu.utils.logging import setup_logger


def main():
    setup_logger("/tmp/iisan_quickstart", "quickstart")

    # 1. Configure - every reference CLI flag is a field here.  For real
    #    data, use iisan_tpu.data.preprocess.read_items/read_behaviors on
    #    the Amazon TSVs and build caches with iisan_tpu.cache_builder.
    cfg = IISANConfig(
        batch_size=16, epoch=5, lr=2e-3,
        adapter_cv_lr=1e-3, adapter_bert_lr=1e-3,
        fine_tune_lr_image=1e-3, fine_tune_lr_text=5e-4,
        embedding_dim=32, bert_adapter_down_size=16, cv_adapter_down_size=16,
        side_adapter_vit_list="1,3,5", side_adapter_bert_list="1,3,5",
        modality="intra_inter", compute_dtype="float32",
        word_embedding_dim=64, image_embedding_dim=64, eval_batch_size=64)

    # 2. Data: user sequences + per-item hidden-state tap tables.
    corpus = synthetic_corpus(n_users=256, item_num=500, seed=0)
    k = len(cfg.san_image_taps())
    cv_taps = synthetic_taps(corpus.item_num, k, 64, seed=1)
    text_taps = synthetic_taps(corpus.item_num, k, 64, seed=2)

    # 3. Train (scan-compiled epochs, early stopping, eval each epoch).
    trainer = CachedTrainer(cfg, corpus, cv_taps, text_taps)
    result = trainer.train()
    print(f"best valid Hit@10 {result.best_hit10:.4f} "
          f"(epoch {result.best_epoch}); "
          f"epoch time {np.median(result.epoch_times[1:] or result.epoch_times):.3f}s")
    print("learned gates:", {k: v.round(3).tolist()[:3]
                             for k, v in trainer.gate_values().items()})

    # 4. Serve: top-K recommendations for new sessions.
    rec = Recommender.from_trainer(trainer)
    ids, scores = rec.top_k([[5, 17, 102], [44, 44, 3, 9]], k=5)
    print("recommendations:", ids.tolist())


if __name__ == "__main__":
    main()
