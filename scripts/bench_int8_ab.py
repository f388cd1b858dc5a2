"""Interleaved same-process A/B: int8 vs bf16 cached tap tables at
Scientific scale, on the real chip.

The only trustworthy comparison on the tunneled v5e is an in-context A/B
of real train epochs in ONE process (docs/ROUND2_NOTES.md: wall clock
varies 20-30% between processes; per-jit-call overhead ~30 ms corrupts
scan microbenchmarks).  This builds two CachedTrainers on the same
corpus — one dense-bf16, one cache_quant=int8 — and interleaves
multi-epoch dispatches A/B/A/B..., reporting medians and the HBM
residency of the tap tables.

    python scripts/bench_int8_ab.py [--reps 6] [--epochs-per-dispatch 8]

Writes INT8_AB.json at the repo root.
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--epochs-per-dispatch", type=int, default=8)
    args = ap.parse_args()

    from iisan_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    from bench import build_corpus
    from iisan_tpu.config import IISANConfig
    from iisan_tpu.data.synthetic import synthetic_taps
    from iisan_tpu.train.cached import CachedTrainer
    from iisan_tpu.utils.logging import setup_logger

    setup_logger("/tmp/iisan_logs", "int8_ab")

    def cfg(**kw):
        return IISANConfig(
            batch_size=64, epoch=1, lr=2e-4, adapter_cv_lr=1e-4,
            adapter_bert_lr=1e-4, fine_tune_lr_image=1e-4,
            fine_tune_lr_text=5e-5, embedding_dim=64,
            bert_adapter_down_size=64, cv_adapter_down_size=64,
            side_adapter_vit_list="1,3,5,7,9,11",
            side_adapter_bert_list="1,3,5,7,9,11",
            modality="intra_inter", seed=12345, **kw)

    corpus = build_corpus(cfg())
    k = len(cfg().san_image_taps())
    cv = synthetic_taps(corpus.item_num, k, 768, seed=1)
    text = synthetic_taps(corpus.item_num, k, 768, seed=2)

    def table_bytes(t):
        leaves = jax.tree_util.tree_leaves((t.cv_table, t.text_table))
        return int(sum(x.size * x.dtype.itemsize for x in leaves))

    trainers = {
        "bf16": CachedTrainer(cfg(), corpus, cv, text),
        "int8": CachedTrainer(cfg(cache_quant="int8"), corpus, cv, text),
    }
    E = args.epochs_per_dispatch
    for t in trainers.values():  # compile + warm both programs first
        t.run_epochs(0, E)
        jax.block_until_ready(t.params)

    times = {name: [] for name in trainers}
    for rep in range(args.reps):
        for name, t in trainers.items():  # interleaved A/B
            t0 = time.time()
            t.run_epochs((rep + 1) * E, E)
            jax.block_until_ready(t.params)
            times[name].append((time.time() - t0) / E)
        print(f"rep {rep}: " + "  ".join(
            f"{n} {times[n][-1]*1e3:.1f} ms/epoch" for n in times),
            flush=True)

    out = {
        "config": "Scientific, bs 64, published IISAN config, "
                  f"median of {args.reps} reps x {E} fused epochs each, "
                  "interleaved in one process",
        "device": jax.devices()[0].device_kind,
    }
    for name in trainers:
        out[f"epoch_seconds_{name}"] = float(np.median(times[name]))
        out[f"table_hbm_bytes_{name}"] = table_bytes(trainers[name])
    out["speed_ratio_int8_vs_bf16"] = (
        out["epoch_seconds_bf16"] / out["epoch_seconds_int8"])
    with open("INT8_AB.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
