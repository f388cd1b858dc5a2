"""A/B the train-mode fused attention kernel on the tower-TRAINING
methods (VERDICT r4 next #1).

Round 4 left the fused_mha kernel unavailable exactly where the
reference hurt most: FFT/LoRA/Houlsby/BitFit differentiate through the
towers, the kernel's backward raised under active attention dropout
(BERT trains at 0.1, matching the reference running HF towers
un-eval()ed, Code_Uncached/run.py:385-414), so those methods fell back
to plain XLA attention — FFT at ~42 users/s / 35% MFU with remat, LoRA/
Houlsby at 13-14 GiB.  Round 5 implemented the backward (PRNG-replay
recompute kernel, ops/fused_attention.py); this script measures what
that buys per method:

  variants per method (each in a FRESH subprocess - compile state and
  OOM'd backends must not leak between rows):
    xla_remat     - fused_tower_attention=False, remat_towers=True
                    (the round-4 operating point for these methods)
    fused_remat   - kernel on, remat kept
    fused_noremat - kernel on, remat OFF: the bwd recompute kernel
                    stores no (B,H,T,T) score tensors, so the step may
                    now fit 16 GB without rematerializing the towers
    xla_noremat   - control for the noremat delta (expected OOM for FFT)

Timing: UncachedTrainer.device_bench (jitted-scan slope, staged data,
XLA's own FLOP count) at the reference batch size 32.  A variant that
fails (OOM / RESOURCE_EXHAUSTED) records an honest {"error": ...} row.

Writes FFT_ATTN_AB.json (merge-preserving).  Usage:
    python scripts/fft_attn_ab.py [--methods fft,lora] [--steps 8]
    python scripts/fft_attn_ab.py --one METHOD VARIANT   (internal)
"""

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, ".")

OVERRIDES = {
    "fft": dict(adapter_type="fft", adding_adapter_to="None",
                fine_tune_to="all"),
    "lora": dict(adapter_type="lora", adding_adapter_to="all",
                 fine_tune_to="None",
                 bert_adapter_down_size=8, cv_adapter_down_size=8),
    "houlsby": dict(adapter_type="houslby", adding_adapter_to="all",
                    fine_tune_to="None",
                    bert_adapter_down_size=64, cv_adapter_down_size=64),
    "bitfit": dict(adapter_type="bitfit", adding_adapter_to="all",
                   fine_tune_to="None"),
}
VARIANTS = {
    "xla_remat": dict(fused=False, remat=True),
    "fused_remat": dict(fused=True, remat=True),
    "fused_noremat": dict(fused=True, remat=False),
    "xla_noremat": dict(fused=False, remat=False),
    # full remat + stored pre-GELU MLP hidden (models/vit.py
    # _remat_policy): the measured middle ground when no-remat OOMs
    "fused_remat_mlp": dict(fused=True, remat="mlp"),
    "xla_remat_mlp": dict(fused=False, remat="mlp"),
    # stacked with the TPU hardware-RNG dropout PRNG (frontier lever)
    "fused_noremat_rbg": dict(fused=True, remat=False, prng="rbg"),
    "fused_remat_rbg": dict(fused=True, remat=True, prng="rbg"),
}
V5E_BF16_PEAK_FLOPS = 197e12


def measure_one(method: str, variant: str, n_steps: int):
    import jax
    import numpy as np

    prng = VARIANTS[variant].get("prng", "threefry2x32")
    jax.config.update("jax_default_prng_impl", prng)

    from iisan_tpu.config import IISANConfig
    from iisan_tpu.data.images import SyntheticImageStore
    from iisan_tpu.data.synthetic import synthetic_corpus
    from iisan_tpu.train.uncached import UncachedTrainer
    from iisan_tpu.utils.compile_cache import enable_compilation_cache
    from iisan_tpu.utils.tpme import trainable_param_count

    enable_compilation_cache()
    v = VARIANTS[variant]
    cfg = IISANConfig(pipeline="uncached", batch_size=32, epoch=1,
                      embedding_dim=64, seed=12345,
                      side_adapter_vit_list="1,3,5,7,9,11",
                      side_adapter_bert_list="1,3,5,7,9,11",
                      fused_tower_attention=v["fused"],
                      remat_towers=v["remat"], dropout_prng=prng,
                      **OVERRIDES[method])
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
        "trainable_params": trainable_param_count(tr),
        "batch_size": cfg.batch_size,
    }


def main():
    if "--one" in sys.argv:
        i = sys.argv.index("--one")
        method, variant = sys.argv[i + 1], sys.argv[i + 2]
        steps = int(sys.argv[i + 3]) if len(sys.argv) > i + 3 else 8
        print(json.dumps(measure_one(method, variant, steps)), flush=True)
        return

    ap = argparse.ArgumentParser()
    ap.add_argument("--methods", default="fft,lora,houlsby,bitfit")
    ap.add_argument("--variants", default=",".join(VARIANTS))
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--out", default="FFT_ATTN_AB.json")
    args = ap.parse_args()

    out = {}
    if os.path.exists(args.out):
        with open(args.out) as fh:
            out = json.load(fh)
    out.setdefault("method", (
        "UncachedTrainer.device_bench jitted-scan slope at reference bs 32, "
        "synthetic-content staged data; one fresh subprocess per row "
        "(scripts/fft_attn_ab.py); towers train un-eval()ed (BERT attn "
        "dropout 0.1 active -> fused_mha train-mode fwd+bwd kernels)"))
    for method in args.methods.split(","):
        row = out.setdefault(method, {})
        for variant in args.variants.split(","):
            print(f"== {method}/{variant}", flush=True)
            try:
                p = subprocess.run(
                    [sys.executable, __file__, "--one", method, variant,
                     str(args.steps)],
                    capture_output=True, text=True,
                    timeout=int(os.environ.get("FFT_AB_TIMEOUT", "2400")))
            except subprocess.TimeoutExpired:
                row[variant] = {
                    "error": "timeout",
                    "detail": "variant compile/run exceeded the per-row "
                              "budget (slow tunnel session); rerun with "
                              "FFT_AB_TIMEOUT raised"}
                print(json.dumps({variant: row[variant]}), flush=True)
                with open(args.out, "w") as fh:
                    json.dump(out, fh, indent=1)
                continue
            line = p.stdout.strip().splitlines()[-1] if p.stdout.strip() \
                else ""
            try:
                row[variant] = json.loads(line)
            except (json.JSONDecodeError, IndexError):
                tail = (p.stderr or "")[-2000:]
                kind = ("oom" if "RESOURCE_EXHAUSTED" in tail
                        or "Out of memory" in tail else "error")
                row[variant] = {"error": kind, "detail": tail[-400:]}
            print(json.dumps({variant: row[variant]}), flush=True)
            with open(args.out, "w") as fh:
                json.dump(out, fh, indent=1)
        base = row.get("xla_remat", {}).get("step_ms")
        for vn, r in row.items():
            if vn != "xla_remat" and base and "step_ms" in r:
                r["saved_ms_vs_xla_remat"] = round(base - r["step_ms"], 2)
        with open(args.out, "w") as fh:
            json.dump(out, fh, indent=1)
    print(json.dumps({"wrote": args.out}))


if __name__ == "__main__":
    main()
