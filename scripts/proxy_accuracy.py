"""Accuracy-parity proxy: does the SAN learn from item features end-to-end?

The reference snapshot ships no tower weights and this environment has no
network egress, so the headline "HR@10/nDCG@10 parity with the paper"
cannot be reproduced directly (docs/PARITY.md).  This script closes the
next-strongest gap: with *informative* item features the cached pipeline
must beat the feature-free ID baseline, and with *uninformative* (random)
features it must match it.  Both predictions are checked on the real
Amazon-Scientific behaviors.

Features: truncated-SVD embeddings of the item co-occurrence matrix built
from TRAIN interactions only (leave-one-out split keeps valid/test
untouched), lifted to the reference's (items, K, 768) tap-tensor geometry
through fixed random projections plus per-layer noise - so the SAN has to
*extract* the signal, not just pass it through.

    python scripts/proxy_accuracy.py [--epochs N]

Writes PROXY_ACCURACY.json at the repo root.
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def cooc_features(corpus, dim=64, window=3, seed=0):
    """Truncated-SVD item embeddings of train-sequence co-occurrence."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    n = corpus.item_num + 1
    rows, cols = [], []
    for seq, m in zip(np.asarray(corpus.train_seqs),
                      np.asarray(corpus.train_log_mask)):
        items = seq[np.concatenate([m, [1.0]]) != 0]
        items = items[items != 0]
        for i in range(len(items)):
            for j in range(max(0, i - window), i):
                rows.append(items[i]); cols.append(items[j])
    vals = np.ones(len(rows), np.float32)
    m = sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
    m = m + m.T
    # log(1+count) damping, then rank-``dim`` SVD
    m.data = np.log1p(m.data)
    u, s, _ = spla.svds(m.astype(np.float32), k=dim,
                        rng=np.random.default_rng(seed))
    emb = u * np.sqrt(s)[None, :]
    emb[0] = 0.0  # pad item
    return (emb / (np.abs(emb).max() + 1e-9)).astype(np.float32)


def lift_to_taps(emb, k, feat_dim, informative=True, seed=0):
    """(items, d) -> (items, K, feat_dim) tap tensors.

    informative: each layer is a fixed random projection of the embedding
    plus layer-specific noise (SNR ~ 1).  Otherwise pure noise with the
    same scale (the 'random caches' control).
    """
    rng = np.random.default_rng(seed)
    n, d = emb.shape
    taps = rng.standard_normal((n, k, feat_dim)).astype(np.float32)
    if informative:
        for i in range(k):
            proj = rng.standard_normal((d, feat_dim)).astype(np.float32)
            proj /= np.sqrt(d)
            taps[:, i, :] = taps[:, i, :] + emb @ proj * 4.0
    taps[0] = 0.0
    return taps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=40)
    args = ap.parse_args()

    from iisan_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    from iisan_tpu.config import IISANConfig
    from iisan_tpu.data.preprocess import read_behaviors, read_items
    from iisan_tpu.train.cached import CachedTrainer
    from iisan_tpu.train.id_pipeline import IDTrainer
    from iisan_tpu.utils.logging import setup_logger

    setup_logger("/tmp/iisan_logs", "proxy_accuracy")
    base = "/root/reference/Dataset/Scientific"
    titles, n2i, i2n = read_items(f"{base}/Industrial_and_Scientific_items.tsv")
    cfg = IISANConfig(
        batch_size=64, epoch=args.epochs, lr=2e-4, adapter_cv_lr=1e-4,
        adapter_bert_lr=1e-4, fine_tune_lr_image=1e-4, fine_tune_lr_text=5e-5,
        embedding_dim=64, bert_adapter_down_size=64, cv_adapter_down_size=64,
        side_adapter_vit_list="1,3,5,7,9,11",
        side_adapter_bert_list="1,3,5,7,9,11",
        modality="intra_inter", seed=12345)
    corpus = read_behaviors(f"{base}/am_Industrial_and_Scientific_users.tsv",
                            n2i, i2n, cfg.max_seq_len, cfg.min_seq_len)
    k = len(cfg.san_image_taps())

    print("building co-occurrence SVD features ...", flush=True)
    t0 = time.time()
    emb = cooc_features(corpus, dim=64)
    print(f"  {time.time()-t0:.1f}s", flush=True)

    results = {}

    def run_cached(tag, informative):
        cv = lift_to_taps(emb, k, 768, informative, seed=1)
        text = lift_to_taps(emb, k, 768, informative, seed=2)
        tr = CachedTrainer(cfg, corpus, cv, text)
        res = tr.train()
        results[tag] = dict(best_hit10=res.best_hit10,
                            best_ndcg10=res.best_ndcg10,
                            best_epoch=res.best_epoch,
                            epochs_run=res.epochs_run)
        print(f"{tag}: Hit@10={res.best_hit10:.4f} "
              f"nDCG@10={res.best_ndcg10:.4f} (epoch {res.best_epoch})",
              flush=True)

    run_cached("iisan_informative_features", True)
    run_cached("iisan_random_features", False)

    id_tr = IDTrainer(cfg, corpus)
    id_res = id_tr.train()
    results["id_baseline"] = dict(best_hit10=id_res.best_hit10,
                                  best_ndcg10=id_res.best_ndcg10,
                                  best_epoch=id_res.best_epoch,
                                  epochs_run=id_res.epochs_run)
    print(f"id_baseline: Hit@10={id_res.best_hit10:.4f} "
          f"nDCG@10={id_res.best_ndcg10:.4f}", flush=True)

    results["prediction_informative_beats_id"] = bool(
        results["iisan_informative_features"]["best_hit10"]
        > results["id_baseline"]["best_hit10"])
    results["prediction_random_matches_id"] = bool(
        abs(results["iisan_random_features"]["best_hit10"]
            - results["id_baseline"]["best_hit10"])
        < 0.3 * results["id_baseline"]["best_hit10"] + 0.01)
    with open("PROXY_ACCURACY.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
