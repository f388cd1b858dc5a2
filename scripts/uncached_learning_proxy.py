"""Uncached-pipeline learning-signal proxy (VERDICT r4 next #6).

The cached accuracy proxy (scripts/proxy_accuracy.py) proves the SAN
learns from item features — but only through CachedTrainer.  This
script closes the one pipeline that proxy never exercises end-to-end:
learning from raw CONTENT through real in-graph towers
(Code_Uncached/run.py:43-537 is the tree the paper's headline
efficiency table trains).

Design: tiny BERT/ViT towers train FULLY (adapter_type='fft',
fine_tune_to='all') on the real Amazon Scientific behaviors, where each
item's content either ENCODES a collaborative signal or is noise:

  * features: truncated-SVD embeddings of the train-interaction
    co-occurrence matrix (same basis as the cached proxy);
  * informative: item i's IMAGE pixels render emb[i] (clipped linear
    map to uint8) and its TOKENS quantize emb[i] dimension-wise into
    per-position vocabulary bins — the towers must *extract* the
    collaborative signal from pixels/ids;
  * random: identical construction from a per-item FIXED random vector
    of the same scale — consistent item codes with no collaborative
    content (the towers can still memorize identity through them, like
    an ID model, so the margin isolates content-information, not
    capacity).

informative > random at >=2 sigma on the valid/test splits = the
uncached pipeline learns from content end-to-end.

Writes UNCACHED_LEARNING_PROXY.json (merge-preserving; partial records
resumed).  Usage:
    python scripts/uncached_learning_proxy.py [--epochs 15]
        [--seeds 0,1,2] [--users 2000]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

PARTIAL = "UNCACHED_LEARNING_PROXY_partial.json"


def subset_users(corpus, n: int, seed: int = 0):
    """First-N-users view of a Corpus (item tables stay full-catalog)."""
    if n >= corpus.n_users:
        return corpus
    keep = np.random.default_rng(seed).permutation(corpus.n_users)[:n]
    return dataclasses.replace(
        corpus,
        train_seqs=corpus.train_seqs[keep],
        train_log_mask=corpus.train_log_mask[keep],
        valid_tokens=corpus.valid_tokens[keep],
        valid_log_mask=corpus.valid_log_mask[keep],
        valid_target=corpus.valid_target[keep],
        valid_history=corpus.valid_history[keep],
        test_tokens=corpus.test_tokens[keep],
        test_log_mask=corpus.test_log_mask[keep],
        test_target=corpus.test_target[keep],
        test_history=corpus.test_history[keep])


class ContentImageStore:
    """Images whose pixels render a per-item vector (uint8)."""

    def __init__(self, vecs_by_name, resize: int):
        self.vecs = vecs_by_name
        self.resize = resize

    def get(self, name: str) -> np.ndarray:
        v = self.vecs[name]
        n_px = self.resize * self.resize * 3
        tiled = np.resize(v, n_px)
        return np.clip(tiled * 64.0 + 128.0, 0, 255).reshape(
            self.resize, self.resize, 3).astype(np.uint8)


def token_table_from_vecs(vecs, n_words: int, n_bins: int = 32):
    """(items+1, d) vectors -> [tokens | mask] table: position j's token
    is 1 + j*n_bins + bin(v[j]) (per-position vocabulary stripes)."""
    n = vecs.shape[0]
    edges = np.linspace(-2.0, 2.0, n_bins - 1)
    tab = np.zeros((n, 2 * n_words), np.int32)
    for j in range(n_words):
        col = vecs[:, j % vecs.shape[1]]
        bins = np.digitize(col, edges)
        tab[:, j] = 1 + j * n_bins + bins
    tab[:, n_words:] = 1          # attention mask: all positions real
    tab[0] = 0                    # pad item
    return tab


def make_vecs(emb, informative: bool, seed: int):
    """Per-item content vectors: the SVD embedding, or same-scale fixed
    random codes (emb rows are max-normalized to ~[-1, 1])."""
    if informative:
        return emb * 2.0
    rng = np.random.default_rng(seed)
    r = rng.standard_normal(emb.shape).astype(np.float32) * 0.5
    r[0] = 0.0
    return r


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=15)
    ap.add_argument("--seeds", type=str, default="0,1,2")
    ap.add_argument("--users", type=int, default=2000)
    ap.add_argument("--dataset", type=str, default="scientific")
    ap.add_argument("--out", default="UNCACHED_LEARNING_PROXY.json")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the TPU plugin ignores "
                         "JAX_PLATFORMS; this uses jax.config before "
                         "backend init)")
    ap.add_argument("--partial", default=PARTIAL,
                    help="resume-state path (give concurrent dataset "
                         "runs distinct files; the final --out merge is "
                         "per-dataset and race-free)")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    seeds = [int(s) for s in args.seeds.split(",")]

    from proxy_accuracy import cooc_features, load_dataset, summarize

    from iisan_tpu.config import IISANConfig
    from iisan_tpu.train.uncached import UncachedTrainer
    from iisan_tpu.utils.compile_cache import enable_compilation_cache
    from iisan_tpu.utils.logging import setup_logger

    enable_compilation_cache()
    setup_logger("/tmp/iisan_logs", "uncached_proxy")

    n_words = 12
    base_cfg = IISANConfig(
        pipeline="uncached", batch_size=32, epoch=args.epochs,
        embedding_dim=32, word_embedding_dim=64, image_embedding_dim=64,
        text_layers=2, image_layers=2, CV_resize=16,
        num_words_title=n_words,
        side_adapter_vit_list="0,1", side_adapter_bert_list="0,1",
        adapter_type="fft", adding_adapter_to="None", fine_tune_to="all",
        lr=2e-4, fine_tune_lr_image=1e-4, fine_tune_lr_text=1e-4,
        seed=12345)

    full = load_dataset(args.dataset, base_cfg)
    corpus = subset_users(full, args.users)
    print(f"[{args.dataset}] items {corpus.item_num} users "
          f"{corpus.n_users} (of {full.n_users})", flush=True)
    t0 = time.time()
    emb = cooc_features(full, dim=64)
    print(f"cooc-SVD features {time.time()-t0:.1f}s", flush=True)

    done = {}
    if os.path.exists(args.partial):
        with open(args.partial) as f:
            done = json.load(f)

    for seed in seeds:
        for variant in ("informative", "random"):
            key = f"{args.dataset}/{variant}/seed{seed}"
            if key in done \
                    and done[key].get("epochs_budget") == args.epochs \
                    and done[key].get("users_basis") == args.users:
                print(f"{key}: cached ({done[key]['best_hit10']:.4f})",
                      flush=True)
                continue
            cfg = base_cfg.replace(seed=12345 + seed)
            vecs = make_vecs(emb, variant == "informative", 7000 + seed)
            tok = token_table_from_vecs(vecs, n_words)
            store = ContentImageStore(
                {nm: vecs[i] for i, nm in enumerate(corpus.item_names)},
                cfg.CV_resize)
            t0 = time.time()
            tr = UncachedTrainer(cfg, corpus, tok, store)
            res = tr.train()
            test_hit, test_ndcg = res.best_test_metrics or (None, None)
            done[key] = dict(
                dataset=args.dataset, variant=variant, seed=seed,
                epochs_budget=args.epochs, users_basis=args.users,
                best_hit10=res.best_hit10, best_ndcg10=res.best_ndcg10,
                test_hit10=test_hit, test_ndcg10=test_ndcg,
                best_epoch=res.best_epoch, epochs_run=res.epochs_run,
                wall_seconds=time.time() - t0)
            with open(args.partial, "w") as f:
                json.dump(done, f, indent=1)
            print(f"{key}: Hit@10={res.best_hit10:.4f} "
                  f"test={None if test_hit is None else round(test_hit, 4)} "
                  f"best_ep={res.best_epoch} ({time.time()-t0:.0f}s)",
                  flush=True)

    runs = {}
    for r in done.values():
        if r["dataset"] == args.dataset \
                and r.get("epochs_budget") == args.epochs \
                and r.get("users_basis") == args.users:
            runs.setdefault(r["variant"], []).append(r)
    summary = summarize(runs)
    out = {}
    if os.path.exists(args.out):
        with open(args.out) as fh:
            out = json.load(fh)
    out[args.dataset] = summary
    out["method"] = (
        "UncachedTrainer, tiny towers trained END-TO-END "
        "(adapter_type=fft, fine_tune_to=all; text/image 2 layers x 64 "
        f"wide, {base_cfg.CV_resize}px images, {n_words} tokens) on real "
        "Amazon behaviors; content = SVD co-occurrence embedding rendered "
        "into pixels/token-bins (informative) vs per-item fixed random "
        "codes of the same scale (random). scripts/uncached_learning_proxy.py")
    out["basis"] = {"users": corpus.n_users, "epochs": args.epochs,
                    "seeds": seeds}
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: v for k, v in summary.items()
                      if k.startswith(("margin", "test_margin"))},
                     default=float))
    print(json.dumps({"wrote": args.out}))


if __name__ == "__main__":
    main()
