"""A/B the dropout PRNG implementation on the train-mode tower forward.

UNCACHED_FLOOR.json attributes ~4.5 ms/step (bs 32) to tower dropout —
mask generation + apply for BERT's hidden/attention dropout (the
reference trains its frozen towers un-eval()ed, so this is a real cost
of the uncached step).  JAX's default threefry2x32 generator is a
software PRNG that costs real VPU time; TPUs have a hardware RNG the
`rbg` implementation uses via XLA's RngBitGenerator.  Dropout masks are
stochastic by definition, so swapping the generator changes draws, not
semantics (determinism per seed is preserved within one impl).

Measures towers_fwd_train_mode (the uncached_floor block) under each
impl in a fresh default-prng config, merge-writing PRNG_IMPL_AB.json.
Usage:
    python scripts/prng_impl_ab.py --impl threefry2x32
    python scripts/prng_impl_ab.py --impl rbg
(one process per impl: the default-prng config must be set before any
key is traced into the timed executable).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

from uncached_floor import (V5E_BF16_PEAK_FLOPS, _timed_scan, make_trainer,
                            mfu, staged_inputs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--impl", required=True,
                    choices=["threefry2x32", "rbg", "unsafe_rbg"])
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--out", default="PRNG_IMPL_AB.json")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_default_prng_impl", args.impl)
    from iisan_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    kind = jax.devices()[0].device_kind
    peak = V5E_BF16_PEAK_FLOPS if "v5" in kind else None
    tr = make_trainer(args.batch)
    model, params = tr.model, tr.params
    images, tokens = staged_inputs(tr)

    def towers_train_mode(taint, params_, images_, tokens_):
        cv_taps, text_taps = model.apply(
            {"params": params_}, images_ + taint.astype(images_.dtype),
            tokens_ + taint, False, method=model.encode_taps,
            rngs={"dropout": jax.random.PRNGKey(taint)})
        return (jnp.mean(cv_taps.astype(jnp.float32))
                + jnp.mean(text_taps.astype(jnp.float32)))[None]

    sec, flops, mem = _timed_scan(towers_train_mode,
                                  (params, images, tokens), args.steps)
    out = {}
    if os.path.exists(args.out):
        with open(args.out) as fh:
            out = json.load(fh)
    out.update(device_kind=kind, batch=args.batch,
               method="towers_fwd_train_mode (scripts/uncached_floor.py "
                      "block) under jax_default_prng_impl")
    out[args.impl] = {"ms": round(sec * 1e3, 3), "tflops": flops / 1e12,
                      "mfu_vs_peak": mfu(flops, sec, peak),
                      "memory_mb": mem / 2**20 if mem else None}
    tf = out.get("threefry2x32", {}).get("ms")
    for k in ("rbg", "unsafe_rbg"):
        if tf is not None and k in out:
            out[k]["saved_ms_vs_threefry"] = round(tf - out[k]["ms"], 2)
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({args.impl: out[args.impl]}))


if __name__ == "__main__":
    main()
