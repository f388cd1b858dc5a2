"""Uncached-step floor analysis: attribute every millisecond of the
IISAN-uncached train step (VERDICT r2 weak #2 - the cached path has a
per-block ablation table in the README; this produces the uncached one).

Per batch size, measured as jitted N-step scans on pre-staged device data
(no dispatch gaps; FLOPs from the compiled executable, not hand math):

  * full train step        - towers fwd + SAN/user/loss fwd+bwd + Adam
  * frozen towers forward  - encode_taps (ViT + BERT, hidden-state taps),
    in eval mode and in train mode (dropout+PRNG on, what the step pays)
  * ViT forward alone      - the FLOPs giant (bs*11 images x 197 tokens)
  * BERT forward alone     - bs*11 seqs x 30 tokens
  * big-GEMM calibration   - a bf16 matmul chain of comparable FLOPs:
    what THIS chip actually sustains on MXU-shaped work (the honest
    "speed of light" to compare MFU against, instead of the paper peak)

plus the trainable tail (full step minus towers) by subtraction and the
fused-attention contribution (fused_tower_attention on vs off).

Timing methodology (axon-tunnel-safe, established empirically this round):
the tunnel acknowledges dispatches before remote completion, so
``block_until_ready`` can return early; only fetching an output value
bounds the computation.  And one dispatch+fetch carries ~25-30 ms of
fixed round-trip cost.  Every per-step number here is therefore the
SLOPE between a short and a long scan of the same body, each timed by
fetching the scalar carry - fixed overhead cancels exactly, and a salt
input differing per call defeats any request-level result caching.
Calibration: a carry-chained 4096x4096 bf16 matmul scan measures
0.714 ms/matmul = 193 TFLOPs = 98% of the v5e paper peak with this
method (vs physically impossible numbers from block_until_ready timing).

    python scripts/uncached_floor.py [--batches 32,64,128] [--steps 4]

Writes UNCACHED_FLOOR.json at the repo root.
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

V5E_BF16_PEAK_FLOPS = 197e12  # TPU v5e bf16 peak per chip

_salt_counter = [0]


def _next_salt():
    _salt_counter[0] += 1
    return np.float32(_salt_counter[0])


def _fetch_timed(compiled, *args):
    """Execute and FETCH the (scalar) result - the only completion bound
    the axon tunnel honors.  Returns wall seconds including one ~27 ms
    round trip (cancelled later by the two-length slope)."""
    t0 = time.perf_counter()
    np.asarray(compiled(*args))
    return time.perf_counter() - t0


def _timed_scan(fn, args, n_steps: int):
    """Time fn as the slope between an n_steps and a 3*n_steps lax.scan;
    return (sec_per_step, flops_per_step, memory_bytes).

    XLA hazards defeated explicitly: (1) loop-invariant code motion would
    hoist a carry-independent body OUT of the scan, so every iteration
    taints its inputs with a value derived from the carry that is zero at
    runtime but opaque at compile time; (2) consuming one output element
    would invite partial DCE, so the carry accumulates a full-tensor
    reduction; (3) the carry is seeded with a runtime salt input so no
    two timed executions present identical (executable, inputs) requests
    to the tunnel.  fn must accept (taint, *args) and add the int32 taint
    scalar (runtime 0) to an input of its choice."""
    import jax
    import jax.numpy as jnp

    def make(length):
        def run(salt, *args_):
            # args flow in as runtime inputs (closing over device arrays
            # would bake them into the executable as constants; the
            # remote-compile service rejects >~500 MB bodies with 413)
            def body(carry, _):
                # opaque-zero taint: isnan(finite carry) is False at
                # runtime, unknowable at compile time, so the body
                # depends on the carry and cannot hoist
                taint = jnp.where(jnp.isnan(carry), 1, 0).astype(jnp.int32)
                out = fn(taint, *args_)
                return carry + jnp.mean(out.astype(jnp.float32)), None

            c, _ = jax.lax.scan(body, salt, None, length=length)
            return c

        return jax.jit(run)

    n1, n2 = n_steps, 3 * n_steps
    salt0 = jnp.float32(0.0)
    c1 = make(n1).lower(salt0, *args).compile()
    c2 = make(n2).lower(salt0, *args).compile()
    # XLA cost analysis counts a scan (while-loop) body ONCE, not
    # multiplied by trip count (verified empirically) - so the program
    # flops ARE the per-step flops.
    flops = float((c1.cost_analysis() or {}).get("flops", 0.0))
    for c in (c1, c2):  # warm both executables
        _fetch_timed(c, _next_salt(), *args)
    t1 = min(_fetch_timed(c1, _next_salt(), *args) for _ in range(2))
    t2 = min(_fetch_timed(c2, _next_salt(), *args) for _ in range(2))
    sec_per_step = max(t2 - t1, 1e-9) / (n2 - n1)
    from iisan_tpu.utils.tpme import compiled_memory_bytes

    return sec_per_step, flops, compiled_memory_bytes(c2)


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
    import jax.numpy as jnp

    rows = {}
    tr = make_trainer(bs)
    model, params = tr.model, tr.params
    images, tokens = staged_inputs(tr)

    b = tr.device_bench(n_steps * 3)
    rows["full_step"] = {
        "ms": b["seconds_per_step"] * 1e3,
        "tflops": b["flops_per_step"] / 1e12,
        "mfu_vs_peak": mfu(b["flops_per_step"], b["seconds_per_step"], peak),
        "memory_mb": (b["memory_bytes"] or 0) / 2**20,
        "users_per_sec": b["users_per_sec"],
    }

    # params flow through as runtime args: closing over them would embed
    # ~800 MB of tower weights as HLO constants (the remote-compile
    # service rejects the request body with HTTP 413)
    def _both(cv_taps, text_taps):
        # consume BOTH tower outputs: returning only cv_taps lets XLA
        # dead-code-eliminate the entire BERT forward (observed: the
        # towers row timed == the ViT row to 3 digits)
        return (jnp.mean(cv_taps.astype(jnp.float32))
                + jnp.mean(text_taps.astype(jnp.float32)))[None]

    def towers(taint, params_, images_, tokens_):
        cv_taps, text_taps = model.apply(
            {"params": params_}, images_ + taint.astype(images_.dtype),
            tokens_ + taint, True, method=model.encode_taps)
        return _both(cv_taps, text_taps)

    def towers_train_mode(taint, params_, images_, tokens_):
        # what the train step actually pays for the towers: dropout ON
        # (the reference trains the towers un-eval()ed), PRNG included
        cv_taps, text_taps = model.apply(
            {"params": params_}, images_ + taint.astype(images_.dtype),
            tokens_ + taint, False, method=model.encode_taps,
            rngs={"dropout": jax.random.PRNGKey(taint)})
        return _both(cv_taps, text_taps)

    def vit_only(taint, params_, images_):
        _, hid = model.apply(
            {"params": params_}, images_ + taint.astype(images_.dtype), True,
            method=lambda m, im, det: m.image_tower(im, det))
        return hid

    def bert_only(taint, params_, tokens_):
        vec, _ = model.apply(
            {"params": params_}, tokens_ + taint, True,
            method=lambda m, tk, det: m.text_tower(tk, det))
        return vec

    for name, fn, args in (("towers_fwd", towers, (params, images, tokens)),
                           ("towers_fwd_train_mode", towers_train_mode,
                            (params, images, tokens)),
                           ("vit_fwd", vit_only, (params, images)),
                           ("bert_fwd", bert_only, (params, tokens))):
        sec, flops, mem = _timed_scan(fn, args, n_steps)
        rows[name] = {"ms": sec * 1e3, "tflops": flops / 1e12,
                      "mfu_vs_peak": mfu(flops, sec, peak),
                      "memory_mb": mem / 2**20 if mem else None}

    # fused-attention ablation: the towers-forward with the Pallas fused
    # attention kernels disabled (XLA-native attention instead)
    tr_nf = make_trainer(bs, fused_attention=False)
    images2, tokens2 = staged_inputs(tr_nf)
    model2, params2 = tr_nf.model, tr_nf.params

    def towers_nofused(taint, params_, images_, tokens_):
        cv_taps, text_taps = model2.apply(
            {"params": params_}, images_ + taint.astype(images_.dtype),
            tokens_ + taint, True, method=model2.encode_taps)
        return _both(cv_taps, text_taps)

    sec, flops, mem = _timed_scan(towers_nofused,
                                  (params2, images2, tokens2), n_steps)
    rows["towers_fwd_no_fused_attn"] = {
        "ms": sec * 1e3, "tflops": flops / 1e12,
        "mfu_vs_peak": mfu(flops, sec, peak)}

    # derived: the trainable tail (SAN + user encoder + loss + Adam fwd+bwd
    # + image normalize + tap gathers) — subtract the TRAIN-MODE towers
    # so the towers' own dropout cost is not misattributed to the tail
    rows["trainable_tail_derived"] = {
        "ms": rows["full_step"]["ms"] - rows["towers_fwd_train_mode"]["ms"],
        "note": "full_step - towers_fwd_train_mode (the cached pipeline "
                "measures its SAN+UE+loss+Adam step directly at "
                "0.098 s / 189 steps = 0.5 ms at bs 64)",
    }
    rows["tower_dropout_cost_derived"] = {
        "ms": (rows["towers_fwd_train_mode"]["ms"]
               - rows["towers_fwd"]["ms"]),
        "note": "towers train-mode (dropout+PRNG on) minus eval-mode",
    }
    del tr, tr_nf
    return rows


def gemm_calibration(peak, n_steps: int = 8, size: int = 4096,
                     chain: int = 24):
    """What this chip sustains on pure MXU-shaped bf16 work: a
    carry-chained sequence of (size x size) matmuls (each feeds the next,
    so nothing hoists or folds), timed by the same two-length slope +
    value fetch as everything else.  The honest ceiling for MFU
    comparisons."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((size, size)) / np.sqrt(size),
                    jnp.bfloat16)

    def make(length):
        def run(salt, a_):
            def body(x, _):
                y = jnp.dot(x, a_, preferred_element_type=jnp.bfloat16)
                return y, None

            x0 = a_ + salt.astype(jnp.bfloat16) * 0  # salt-dependent input
            x, _ = jax.lax.scan(body, x0, None, length=length)
            return jnp.mean(x.astype(jnp.float32)) + salt

        return jax.jit(run)

    n1, n2 = n_steps * chain, 3 * n_steps * chain
    c1 = make(n1).lower(jnp.float32(0.0), a).compile()
    c2 = make(n2).lower(jnp.float32(0.0), a).compile()
    for c in (c1, c2):
        _fetch_timed(c, _next_salt(), a)
    t1 = min(_fetch_timed(c1, _next_salt(), a) for _ in range(2))
    t2 = min(_fetch_timed(c2, _next_salt(), a) for _ in range(2))
    sec_per_matmul = (t2 - t1) / (n2 - n1)
    flops_per_matmul = 2.0 * size ** 3
    sec = sec_per_matmul * chain
    flops = flops_per_matmul * chain
    return {"ms": sec * 1e3, "tflops": flops / 1e12,
            "mfu_vs_peak": mfu(flops, sec, peak),
            "shape": f"{chain} carry-chained {size}x{size} bf16 matmuls "
                     f"per 'step' (slope of {n1}- vs {n2}-long scans)"}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="32,64,128")
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--out", default="UNCACHED_FLOOR.json")
    args = ap.parse_args()

    from iisan_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    kind = jax.devices()[0].device_kind
    peak = V5E_BF16_PEAK_FLOPS if "v5" in kind else None

    out = {"device_kind": kind, "peak_flops": peak, "batches": {},
           "method": "two-length scan slope, value-fetch timed "
                     "(UNCACHED_FLOOR docstring)"}
    out["gemm_calibration"] = gemm_calibration(peak, args.steps)
    print(f"gemm ceiling: {out['gemm_calibration']['mfu_vs_peak']:.3f} "
          f"of paper peak ({out['gemm_calibration']['tflops'] / (out['gemm_calibration']['ms'] / 1e3):.0f} TFLOPs)",
          flush=True)
    for bs in [int(b) for b in args.batches.split(",")]:
        try:
            rows = measure_batch(bs, args.steps, peak)
        except Exception as e:  # e.g. bs>=256 exceeds the remote-compile
            # service's request-body limit (HTTP 413) in this environment
            out["batches"][str(bs)] = {"error": f"{type(e).__name__}: {e}"[:300]}
            print(f"bs {bs}: FAILED {type(e).__name__}", flush=True)
            with open(args.out, "w") as fh:
                json.dump(out, fh, indent=1)
            continue
        out["batches"][str(bs)] = rows
        # persist per batch: a late failure must not lose measured rows
        with open(args.out, "w") as fh:
            json.dump(out, fh, indent=1)
        f = rows["full_step"]
        print(f"bs {bs:>4}: step {f['ms']:7.2f} ms  {f['tflops']:.2f} TF  "
              f"MFU {f['mfu_vs_peak']:.3f}  "
              f"towers {rows['towers_fwd']['ms']:7.2f} ms "
              f"(vit {rows['vit_fwd']['ms']:.2f} + "
              f"bert {rows['bert_fwd']['ms']:.2f}; "
              f"train-mode {rows['towers_fwd_train_mode']['ms']:.2f})  "
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
