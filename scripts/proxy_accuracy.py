"""Accuracy-parity proxy: does the SAN learn from item features end-to-end?

The reference snapshot ships no tower weights and this environment has no
network egress, so the headline "HR@10/nDCG@10 parity with the paper"
cannot be reproduced directly (docs/PARITY.md).  This script closes the
next-strongest gap: with *informative* item features the cached pipeline
must beat the feature-free ID baseline, and with *uninformative* (random)
features it must match it.  Checked on the real Amazon behaviors
(Scientific AND Instrument), over multiple seeds, with mean +- std and a
2-sigma test on the informative-vs-ID margin (VERDICT r1 weak #2: a
single seed cannot exclude noise at these magnitudes).

Features: truncated-SVD embeddings of the item co-occurrence matrix built
from TRAIN interactions only (leave-one-out split keeps valid/test
untouched), lifted to the reference's (items, K, 768) tap-tensor geometry
through fixed random projections plus per-layer noise - so the SAN has to
*extract* the signal, not just pass it through.

    python scripts/proxy_accuracy.py [--epochs N] [--seeds 0,1,2]
        [--datasets scientific,instrument]

Writes PROXY_ACCURACY.json at the repo root; partial results land in
PROXY_ACCURACY_partial.json after every run and are resumed on rerun.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

PARTIAL = "PROXY_ACCURACY_partial.json"


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


def load_dataset(name, cfg):
    from datasets import DATASETS

    from iisan_tpu.data.preprocess import read_behaviors, read_items

    d = DATASETS[name]
    base = os.path.join("/root/reference", d["dataset"])
    items_path = os.path.join(base, d["news"])
    if os.path.exists(items_path):
        titles, n2i, i2n = read_items(items_path)
    else:
        # Office ships behaviors only (.MISSING_LARGE_BLOBS); the proxy
        # needs no titles (SVD co-occurrence features), so synthesize the
        # registry from behaviors - the ETL densifies to interacted items
        # either way
        from iisan_tpu.data.preprocess import items_from_behaviors

        titles, n2i, i2n = items_from_behaviors(
            os.path.join(base, d["behaviors"]))
    corpus = read_behaviors(os.path.join(base, d["behaviors"]), n2i, i2n,
                            cfg.max_seq_len, cfg.min_seq_len)
    return corpus


def summarize(runs):
    """runs: {variant: [record...]} -> summary with mean/std and the
    2-sigma margin test (Welch-style SE of the difference in means), on
    BOTH the valid split (best_hit10) and the test split at the
    best-valid epoch (test_hit10) - the reference protocol reports
    test-at-best (Code_Uncached/run.py:431-438)."""
    out = {}
    for variant, rs in runs.items():
        rec = dict(n=len(rs))
        for split, hk, nk in (("", "best_hit10", "best_ndcg10"),
                              ("test_", "test_hit10", "test_ndcg10")):
            if not all(r.get(hk) is not None for r in rs):
                continue  # pre-round-3 records carried valid-only
            h = np.array([r[hk] for r in rs], np.float64)
            nd = np.array([r[nk] for r in rs], np.float64)
            rec[f"{split}hit10_mean"] = float(h.mean())
            rec[f"{split}hit10_std"] = (float(h.std(ddof=1))
                                        if len(rs) > 1 else 0.0)
            rec[f"{split}ndcg10_mean"] = float(nd.mean())
            rec[f"{split}ndcg10_std"] = (float(nd.std(ddof=1))
                                         if len(rs) > 1 else 0.0)
        out[variant] = rec
    for a, b, tag in (("informative", "id", "informative_vs_id"),
                      ("informative", "random", "informative_vs_random"),
                      ("random", "id", "random_vs_id")):
        if a not in out or b not in out or out[a]["n"] < 2 \
                or out[b]["n"] < 2:
            continue
        for split in ("", "test_"):
            mk = f"{split}hit10_mean"
            if mk not in out[a] or mk not in out[b]:
                continue
            margin = out[a][mk] - out[b][mk]
            sk = f"{split}hit10_std"
            se = float(np.sqrt(out[a][sk] ** 2 / out[a]["n"]
                               + out[b][sk] ** 2 / out[b]["n"]))
            out[f"{split}margin_{tag}"] = dict(
                hit10=margin, se=se,
                sigmas=margin / se if se > 0 else float("inf"),
                significant_2sigma=bool(se > 0 and margin > 2 * se))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--seeds", type=str, default="0,1,2")
    ap.add_argument("--datasets", type=str, default="scientific,instrument")
    args = ap.parse_args()
    seeds = [int(s) for s in args.seeds.split(",")]

    from iisan_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    from iisan_tpu.config import IISANConfig
    from iisan_tpu.train.cached import CachedTrainer
    from iisan_tpu.train.id_pipeline import IDTrainer
    from iisan_tpu.utils.logging import setup_logger

    setup_logger("/tmp/iisan_logs", "proxy_accuracy")

    done = {}
    if os.path.exists(PARTIAL):
        with open(PARTIAL) as f:
            done = json.load(f)

    base_cfg = IISANConfig(
        batch_size=64, epoch=args.epochs, lr=2e-4, adapter_cv_lr=1e-4,
        adapter_bert_lr=1e-4, fine_tune_lr_image=1e-4, fine_tune_lr_text=5e-5,
        embedding_dim=64, bert_adapter_down_size=64, cv_adapter_down_size=64,
        side_adapter_vit_list="1,3,5,7,9,11",
        side_adapter_bert_list="1,3,5,7,9,11",
        modality="intra_inter", seed=12345)
    k = len(base_cfg.san_image_taps())

    for ds in args.datasets.split(","):
        corpus = load_dataset(ds, base_cfg)
        print(f"[{ds}] items {corpus.item_num} users {corpus.n_users}",
              flush=True)
        t0 = time.time()
        emb = cooc_features(corpus, dim=64)
        print(f"[{ds}] cooc-SVD features {time.time()-t0:.1f}s", flush=True)

        for seed in seeds:
            cfg = base_cfg.replace(seed=12345 + seed)
            for variant in ("informative", "random", "id"):
                key = f"{ds}/{variant}/seed{seed}"
                # Resume only a record trained under the SAME epoch budget
                # (mixed budgets would skew the summary) AND carrying
                # test-split metrics - pre-round-3 records were valid-only
                # and must be re-measured to report test-at-best.
                if key in done \
                        and done[key].get("epochs_budget",
                                          args.epochs) == args.epochs \
                        and "test_hit10" in done[key]:
                    print(f"{key}: cached ({done[key]['best_hit10']:.4f})",
                          flush=True)
                    continue
                t0 = time.time()
                if variant == "id":
                    tr = IDTrainer(cfg, corpus)
                else:
                    cv = lift_to_taps(emb, k, 768, variant == "informative",
                                      seed=1000 + seed)
                    text = lift_to_taps(emb, k, 768,
                                        variant == "informative",
                                        seed=2000 + seed)
                    tr = CachedTrainer(cfg, corpus, cv, text)
                res = tr.train()
                test_hit, test_ndcg = res.best_test_metrics or (None, None)
                done[key] = dict(
                    dataset=ds, variant=variant, seed=seed,
                    epochs_budget=args.epochs,
                    best_hit10=res.best_hit10, best_ndcg10=res.best_ndcg10,
                    test_hit10=test_hit, test_ndcg10=test_ndcg,
                    best_epoch=res.best_epoch, epochs_run=res.epochs_run,
                    wall_seconds=time.time() - t0)
                with open(PARTIAL, "w") as f:
                    json.dump(done, f, indent=1)
                print(f"{key}: Hit@10={res.best_hit10:.4f} "
                      f"nDCG@10={res.best_ndcg10:.4f} "
                      f"test Hit@10={test_hit if test_hit is None else round(test_hit, 4)} "
                      f"({time.time()-t0:.0f}s)", flush=True)

    # Merge-preserving report: an invocation that runs only one dataset
    # (e.g. extra seeds on a <2-sigma cell, VERDICT r3 next #5) must not
    # clobber the other datasets' published rows — start from the
    # existing report and replace only the datasets run this time.
    report = {"epochs": args.epochs, "seeds": seeds, "datasets": {}}
    if os.path.exists("PROXY_ACCURACY.json"):
        with open("PROXY_ACCURACY.json") as f:
            prev = json.load(f)
        if prev.get("epochs") == args.epochs:
            report["datasets"] = prev.get("datasets", {})
    for ds in args.datasets.split(","):
        runs = {}
        for variant in ("informative", "random", "id"):
            # Pool ONLY records matching this invocation's seed list and
            # epoch budget - the report's header fields must describe
            # every pooled record, not just the freshly trained ones.
            rs = [r for key, r in done.items()
                  if r["dataset"] == ds and r["variant"] == variant
                  and r["seed"] in seeds
                  and r.get("epochs_budget", args.epochs) == args.epochs]
            if rs:
                runs[variant] = sorted(rs, key=lambda r: r["seed"])
        report["datasets"][ds] = {"seeds": seeds, "runs": runs,
                                  "summary": summarize(runs)}
    with open("PROXY_ACCURACY.json", "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({ds: report["datasets"][ds]["summary"]
                      for ds in report["datasets"]}, indent=1))


if __name__ == "__main__":
    main()
