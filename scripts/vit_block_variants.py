"""Block-composition experiments: can the ~24 ms/forward composition tax
(VIT_ATTRIBUTION.json: vit_block_chain 110.0 ms vs 86.3 ms sum-of-parts)
be recovered without changing the tower's math?

Variants, all 12 composed ViT-base blocks at the uncached geometry
(352, 197, 768), bf16 activations (matching models/vit.py:94-126):

  * baseline      - LN(f32) -> 3 separate q/k/v GEMMs -> fused_mha ->
    proj + residual -> LN(f32) -> MLP + residual (the shipped block).
  * merged_qkv    - the three (768, 768) projections as ONE (768, 2304)
    GEMM + static slice: one MXU dispatch and one output fusion instead
    of three (weights-concat is a pure reparameterization - identical
    math modulo bf16 accumulation order).
  * bf16_ln       - LayerNorm statistics in bf16 (no f32 casts): lets XLA
    fuse the LN into the neighboring GEMM epilogues. CHANGES NUMERICS
    (~1e-2 relative on normalized outputs) - measured here only to bound
    what the cast tax costs; not shipped without a parity story.
  * merged_bf16   - both.
  * subblock      - LN -> fused_attn_subblock (qkv projection + MHA +
    out projection in ONE Pallas call, ops/fused_attn_subblock.py) ->
    residual -> LN -> MLP + residual: two XLA<->Pallas crossings per
    block instead of five, no XLA GEMM feeding a custom-call layout.
    Identical math to baseline modulo bf16 accumulation order.

Writes VIT_BLOCK_VARIANTS.json (merge-preserving: existing rows are kept
so a selective re-run can't erase prior measurements).  Usage:
    python scripts/vit_block_variants.py [--steps 4] [--variants a,b]
"""

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

from uncached_floor import V5E_BF16_PEAK_FLOPS, _timed_scan, mfu


def make_variant(merged_qkv: bool, bf16_ln: bool, subblock=False):
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from iisan_tpu.ops.fused_attention import fused_mha
    from iisan_tpu.ops.fused_attn_subblock import (fused_attn_subblock,
                                                  fused_attn_subblock_v2)

    rng = np.random.default_rng(3)
    B, T, D, F = 352, 197, 768, 3072
    x = jnp.asarray(rng.standard_normal((B, T, D)) * 0.3, jnp.bfloat16)
    names = ([("qkv", (D, 3 * D))] if merged_qkv or subblock
             else [("q", (D, D)), ("k", (D, D)), ("v", (D, D))])
    names += [("p", (D, D)), ("f1", (D, F)), ("f2", (F, D))]
    ws = {n_: jnp.asarray(rng.standard_normal(sh) / np.sqrt(sh[0]),
                          jnp.bfloat16) for n_, sh in names}
    zero_b = {"qkv": jnp.zeros((3 * D,), jnp.bfloat16),
              "o": jnp.zeros((D,), jnp.bfloat16)}
    ln = nn.LayerNorm(epsilon=1e-12,
                      dtype=jnp.bfloat16 if bf16_ln else jnp.float32)
    ln_params = ln.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, D), jnp.float32))["params"]

    def apply_ln(y, p):
        if bf16_ln:
            return ln.apply({"params": p}, y)
        return ln.apply({"params": p}, y.astype(jnp.float32)
                        ).astype(jnp.bfloat16)

    def fn(taint, x_, ws_, lp):
        y = x_ + taint.astype(x_.dtype)
        for _ in range(12):
            h = apply_ln(y, lp)
            if subblock == "v2":
                a = fused_attn_subblock_v2(h, ws_["qkv"], zero_b["qkv"],
                                           ws_["p"], zero_b["o"],
                                           n_heads=12, group_size=4)
                y = a.astype(jnp.bfloat16) + y
            elif subblock:
                a = fused_attn_subblock(h, ws_["qkv"], zero_b["qkv"],
                                        ws_["p"], zero_b["o"], n_heads=12)
                y = a.astype(jnp.bfloat16) + y
            else:
                if merged_qkv:
                    qkv = h @ ws_["qkv"]
                    q, k, v = (qkv[..., :D], qkv[..., D:2 * D],
                               qkv[..., 2 * D:])
                else:
                    q, k, v = h @ ws_["q"], h @ ws_["k"], h @ ws_["v"]
                a = fused_mha(q, k, v, n_heads=12)
                y = (a @ ws_["p"]).astype(jnp.bfloat16) + y
            h = apply_ln(y, lp)
            h = jax.nn.gelu((h @ ws_["f1"]).astype(jnp.bfloat16),
                            approximate=False)
            y = (h @ ws_["f2"]).astype(jnp.bfloat16) + y
        return y

    return fn, (x, ws, ln_params)


VARIANTS = {"baseline": (False, False, False),
            "merged_qkv": (True, False, False),
            "bf16_ln": (False, True, False),
            "merged_bf16": (True, True, False),
            "subblock": (False, False, True),
            # v2: head-groups on the grid (VERDICT r4 next #2 - removes
            # the serial-per-head-loop confound the round-4 null named)
            "subblock_v2": (False, False, "v2")}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--out", default="VIT_BLOCK_VARIANTS.json")
    ap.add_argument("--variants", default=",".join(VARIANTS),
                    help="comma list of variants to (re-)measure; rows "
                         "already in --out are preserved")
    args = ap.parse_args()

    from iisan_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    import os

    import jax

    kind = jax.devices()[0].device_kind
    peak = V5E_BF16_PEAK_FLOPS if "v5" in kind else None
    out = {}
    if os.path.exists(args.out):
        with open(args.out) as fh:
            out = json.load(fh)
    out.update(device_kind=kind,
               method="two-length scan slope (scripts/uncached_floor.py); "
                      "12 composed ViT-base blocks at (352, 197, 768)")
    for name in args.variants.split(","):
        fn, args_ = make_variant(*VARIANTS[name])
        sec, flops, _ = _timed_scan(fn, args_, args.steps)
        row = {"ms": round(sec * 1e3, 3), "tflops": flops / 1e12,
               "mfu_vs_peak": mfu(flops, sec, peak)}
        if name == "subblock":
            row["flops_basis_caveat"] = (
                "XLA cost analysis cannot see inside the Pallas subblock "
                "kernel, so tflops/mfu here count only the non-Pallas "
                "remainder (MLP GEMMs + LNs); compare ms, not mfu")
        out[name] = row
        print(json.dumps({name: out[name]}), flush=True)
        with open(args.out, "w") as fh:
            json.dump(out, fh, indent=1)
    base = out.get("baseline", {}).get("ms")
    for name in VARIANTS:
        if name != "baseline" and base is not None and name in out:
            out[name]["saved_ms_vs_baseline"] = round(
                base - out[name]["ms"], 2)
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"wrote": args.out}))


if __name__ == "__main__":
    main()
