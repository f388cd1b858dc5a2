"""Record the stacked best-known operating point (VERDICT r4 next #3).

Round 4 measured its uncached levers one at a time against the default
config: `--dropout_prng rbg` (-3.6 ms/step, PRNG_IMPL_AB.json) and
`--tower_quant int8` (-37% step memory, INT8_TOWER_AB.json) — but the
repo's headline (bench.py) runs defaults, so it understates the best
known config.  This script measures the STACKED frontier of the
uncached IISAN step at the reference batch size 32:

  default        - fused_mha + fused user encoder + masked Adam,
                   threefry dropout PRNG (the BENCH/TPME basis)
  throughput     - default + --dropout_prng rbg (TPU hardware RNG)
  memory         - throughput + --tower_quant int8 (W8A8 frozen towers)

One fresh subprocess per row: jax_default_prng_impl is process-global,
so rows must not share a process (ADVICE r4).  Timing is
UncachedTrainer.device_bench (jitted-scan slope on staged data, XLA's
own FLOP count).

Writes FRONTIER.json (merge-preserving).  Usage:
    python scripts/frontier.py [--steps 8]
    python scripts/frontier.py --one VARIANT   (internal)
"""

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, ".")

VARIANTS = {
    "default": dict(dropout_prng="threefry2x32", tower_quant="none"),
    "throughput_rbg": dict(dropout_prng="rbg", tower_quant="none"),
    "memory_rbg_int8": dict(dropout_prng="rbg", tower_quant="int8"),
}
V5E_BF16_PEAK_FLOPS = 197e12


def measure_one(variant: str, n_steps: int):
    import jax
    import numpy as np

    v = VARIANTS[variant]
    jax.config.update("jax_default_prng_impl", v["dropout_prng"])

    from iisan_tpu.config import IISANConfig
    from iisan_tpu.data.images import SyntheticImageStore
    from iisan_tpu.data.synthetic import synthetic_corpus
    from iisan_tpu.train.uncached import UncachedTrainer
    from iisan_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = IISANConfig(pipeline="uncached", batch_size=32, epoch=1,
                      embedding_dim=64, seed=12345,
                      adapter_type="IISAN", adding_adapter_to="all",
                      fine_tune_to="None",
                      side_adapter_vit_list="1,3,5,7,9,11",
                      side_adapter_bert_list="1,3,5,7,9,11",
                      dropout_prng=v["dropout_prng"],
                      tower_quant=v["tower_quant"])
    corpus = synthetic_corpus(n_users=256, item_num=600, seed=0)
    rng = np.random.default_rng(0)
    tokens = np.zeros((corpus.item_num + 1, 60), np.int32)
    tokens[1:, :30] = rng.integers(1, 30000, size=(corpus.item_num, 30))
    tokens[1:, 30:] = 1
    tr = UncachedTrainer(cfg, corpus, tokens, SyntheticImageStore(224))
    b = tr.device_bench(n_steps=n_steps)
    sec = b["seconds_per_step"]
    return {
        "step_ms": round(sec * 1e3, 2),
        "users_per_sec": round(cfg.batch_size / sec, 2),
        "tflops_per_step": b["flops_per_step"] / 1e12,
        "mfu_vs_peak": b["flops_per_step"] / sec / V5E_BF16_PEAK_FLOPS,
        "memory_gb": round((b["memory_bytes"] or 0) / 2 ** 30, 3),
        "config": dict(v),
        "batch_size": cfg.batch_size,
        "basis": ("UncachedTrainer.device_bench jitted-scan slope, bs 32, "
                  "IISAN frozen towers, fused_mha + fused user encoder + "
                  "masked Adam (defaults)"),
    }


def main():
    if "--one" in sys.argv:
        i = sys.argv.index("--one")
        variant = sys.argv[i + 1]
        steps = int(sys.argv[i + 2]) if len(sys.argv) > i + 2 else 8
        print(json.dumps(measure_one(variant, steps)), flush=True)
        return

    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--variants", default=",".join(VARIANTS))
    ap.add_argument("--out", default="FRONTIER.json")
    args = ap.parse_args()

    out = {}
    if os.path.exists(args.out):
        with open(args.out) as fh:
            out = json.load(fh)
    for variant in args.variants.split(","):
        print(f"== {variant}", flush=True)
        p = subprocess.run(
            [sys.executable, __file__, "--one", variant, str(args.steps)],
            capture_output=True, text=True, timeout=1500)
        line = p.stdout.strip().splitlines()[-1] if p.stdout.strip() else ""
        try:
            out[variant] = json.loads(line)
        except (json.JSONDecodeError, IndexError):
            out[variant] = {"error": (p.stderr or "")[-400:]}
        print(json.dumps({variant: out[variant]}), flush=True)
        with open(args.out, "w") as fh:
            json.dump(out, fh, indent=1)
    base = out.get("default", {}).get("step_ms")
    for vn, r in out.items():
        if vn != "default" and base and isinstance(r, dict) \
                and "step_ms" in r:
            r["saved_ms_vs_default"] = round(base - r["step_ms"], 2)
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"wrote": args.out}))


if __name__ == "__main__":
    main()
