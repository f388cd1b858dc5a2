"""Uncached-step floor analysis: attribute every millisecond of the
IISAN-uncached train step (VERDICT r2 weak #2 - the cached path has a
per-block ablation table in the README; this produces the uncached one).

Per batch size, measured as jitted N-step scans on pre-staged device data
(no dispatch gaps; FLOPs from the compiled executable, not hand math):

  * full train step        - towers fwd + SAN/user/loss fwd+bwd + Adam
  * frozen towers forward  - encode_taps (ViT + BERT, hidden-state taps)
  * ViT forward alone      - the FLOPs giant (bs*11 images x 197 tokens)
  * BERT forward alone     - bs*11 seqs x 30 tokens
  * big-GEMM calibration   - a bf16 matmul chain of comparable FLOPs:
    what THIS chip actually sustains on MXU-shaped work (the honest
    "speed of light" to compare MFU against, instead of the paper peak)

plus the trainable tail (full step minus towers) by subtraction and the
fused-attention contribution (fused_tower_attention on vs off).

    python scripts/uncached_floor.py [--batches 32,64,128] [--steps 8]

Writes UNCACHED_FLOOR.json at the repo root.
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

V5E_BF16_PEAK_FLOPS = 197e12  # TPU v5e bf16 peak per chip


def _timed_scan(fn, args, n_steps: int):
    """Compile fn as an n_steps lax.scan, return (sec_per_step, flops_per
    step, memory_bytes).  fn(*args) must return an array whose first
    element keeps the computation live through the carry."""
    import jax
    import jax.numpy as jnp

    def run(*args_):
        # args flow in as runtime inputs (closing over device arrays would
        # bake them into the executable as constants)
        def body(carry, _):
            out = fn(*args_)
            return carry + out.reshape(-1)[0].astype(jnp.float32), None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n_steps)
        return c

    compiled = jax.jit(run).lower(*args).compile()
    flops = float((compiled.cost_analysis() or {}).get("flops", 0.0))
    out = compiled(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    out = compiled(*args)
    jax.block_until_ready(out)
    dt = time.time() - t0
    from iisan_tpu.utils.tpme import compiled_memory_bytes

    return dt / n_steps, flops / n_steps, compiled_memory_bytes(compiled)


def make_trainer(batch_size: int, fused_attention: bool = True):
    from iisan_tpu.config import IISANConfig
    from iisan_tpu.data.images import SyntheticImageStore
    from iisan_tpu.data.synthetic import synthetic_corpus
    from iisan_tpu.train.uncached import UncachedTrainer

    cfg = IISANConfig(
        pipeline="uncached", batch_size=batch_size, epoch=1,
        embedding_dim=64, adapter_type="IISAN", adding_adapter_to="all",
        fine_tune_to="None",
        side_adapter_vit_list="1,3,5,7,9,11",
        side_adapter_bert_list="1,3,5,7,9,11",
        fused_tower_attention=fused_attention,
        lr=2e-4, adapter_cv_lr=1e-4, adapter_bert_lr=1e-4, seed=12345)
    corpus = synthetic_corpus(n_users=max(512, batch_size * 4), item_num=800,
                              seed=0)
    rng = np.random.default_rng(0)
    tokens = np.zeros((corpus.item_num + 1, 60), np.int32)
    tokens[1:, :30] = rng.integers(1, 30000, size=(corpus.item_num, 30))
    tokens[1:, 30:] = 1
    return UncachedTrainer(cfg, corpus, tokens, SyntheticImageStore(224))


def staged_inputs(tr):
    import jax.numpy as jnp

    cfg, c = tr.cfg, tr.corpus
    bs, L = cfg.batch_size, cfg.max_seq_len
    rng_np = np.random.default_rng(0)
    images = tr._put(rng_np.integers(
        0, 256, (bs * (L + 1), cfg.CV_resize, cfg.CV_resize, 3), np.uint8),
        tr._row_sh)
    flat = np.resize(c.train_seqs, (bs, L + 1)).reshape(-1)
    tokens = tr._put(tr.token_table[flat], tr._row_sh)
    return images, tokens


def mfu(flops, sec, peak):
    return flops / sec / peak if peak else None


def measure_batch(bs: int, n_steps: int, peak):
    import jax

    rows = {}
    tr = make_trainer(bs)
    model, params = tr.model, tr.params
    images, tokens = staged_inputs(tr)

    b = tr.device_bench(n_steps)
    rows["full_step"] = {
        "ms": b["seconds_per_step"] * 1e3,
        "tflops": b["flops_per_step"] / 1e12,
        "mfu_vs_peak": mfu(b["flops_per_step"], b["seconds_per_step"], peak),
        "memory_mb": (b["memory_bytes"] or 0) / 2**20,
        "users_per_sec": b["users_per_sec"],
    }

    def towers(images_, tokens_):
        cv_taps, text_taps = model.apply(
            {"params": params}, images_, tokens_, True,
            method=model.encode_taps)
        return cv_taps

    def vit_only(images_):
        _, hid = model.apply(
            {"params": params}, images_, True,
            method=lambda m, im, det: m.image_tower(im, det))
        return hid

    def bert_only(tokens_):
        vec, _ = model.apply(
            {"params": params}, tokens_, True,
            method=lambda m, tk, det: m.text_tower(tk, det))
        return vec

    for name, fn, args in (("towers_fwd", towers, (images, tokens)),
                           ("vit_fwd", vit_only, (images,)),
                           ("bert_fwd", bert_only, (tokens,))):
        sec, flops, mem = _timed_scan(fn, args, n_steps)
        rows[name] = {"ms": sec * 1e3, "tflops": flops / 1e12,
                      "mfu_vs_peak": mfu(flops, sec, peak),
                      "memory_mb": mem / 2**20 if mem else None}

    # fused-attention ablation: the towers-forward with the Pallas fused
    # attention kernels disabled (XLA-native attention instead)
    tr_nf = make_trainer(bs, fused_attention=False)
    images2, tokens2 = staged_inputs(tr_nf)
    model2, params2 = tr_nf.model, tr_nf.params

    def towers_nofused(images_, tokens_):
        cv_taps, _ = model2.apply(
            {"params": params2}, images_, tokens_, True,
            method=model2.encode_taps)
        return cv_taps

    sec, flops, mem = _timed_scan(towers_nofused, (images2, tokens2),
                                  n_steps)
    rows["towers_fwd_no_fused_attn"] = {
        "ms": sec * 1e3, "tflops": flops / 1e12,
        "mfu_vs_peak": mfu(flops, sec, peak)}

    # derived: the trainable tail (SAN + user encoder + loss + Adam fwd+bwd)
    rows["trainable_tail_derived"] = {
        "ms": rows["full_step"]["ms"] - rows["towers_fwd"]["ms"],
        "note": "full_step - towers_fwd (the cached pipeline measures this "
                "directly at 0.098 s / 189 steps = 0.5 ms at bs 64)",
    }
    del tr, tr_nf
    return rows


def gemm_calibration(peak, n_steps: int = 8, size: int = 4096,
                     chain: int = 24):
    """What this chip sustains on pure MXU-shaped bf16 work: a chain of
    (size x size) matmuls.  The honest ceiling for MFU comparisons -
    includes the same tunnel/dispatch overheads as the other rows."""
    import jax
    import jax.numpy as jnp

    a = jnp.ones((size, size), jnp.bfloat16)

    def fn(a_):
        x = a_
        for _ in range(chain):
            x = jnp.dot(x, a_, preferred_element_type=jnp.bfloat16)
        return x * 1e-3  # keep magnitudes bounded

    sec, flops, _ = _timed_scan(fn, (a,), n_steps)
    return {"ms": sec * 1e3, "tflops": flops / 1e12,
            "mfu_vs_peak": mfu(flops, sec, peak),
            "shape": f"{chain} chained {size}x{size} bf16 matmuls"}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="32,64,128")
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--out", default="UNCACHED_FLOOR.json")
    args = ap.parse_args()

    from iisan_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    kind = jax.devices()[0].device_kind
    peak = V5E_BF16_PEAK_FLOPS if "v5" in kind else None

    out = {"device_kind": kind, "peak_flops": peak, "batches": {}}
    out["gemm_calibration"] = gemm_calibration(peak, args.steps)
    print(f"gemm ceiling: {out['gemm_calibration']['mfu_vs_peak']:.3f} "
          f"of paper peak", flush=True)
    for bs in [int(b) for b in args.batches.split(",")]:
        rows = measure_batch(bs, args.steps, peak)
        out["batches"][str(bs)] = rows
        f = rows["full_step"]
        print(f"bs {bs:>4}: step {f['ms']:7.2f} ms  {f['tflops']:.2f} TF  "
              f"MFU {f['mfu_vs_peak']:.3f}  "
              f"towers {rows['towers_fwd']['ms']:7.2f} ms "
              f"(vit {rows['vit_fwd']['ms']:.2f} + "
              f"bert {rows['bert_fwd']['ms']:.2f})  "
              f"tail {rows['trainable_tail_derived']['ms']:.2f} ms",
              flush=True)
    # normalize MFU against what the chip actually sustains on big GEMMs
    ceiling = out["gemm_calibration"]["mfu_vs_peak"]
    for bs, rows in out["batches"].items():
        for r in rows.values():
            if isinstance(r, dict) and r.get("mfu_vs_peak") is not None:
                r["mfu_vs_gemm_ceiling"] = r["mfu_vs_peak"] / ceiling
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
