"""ViT-forward attribution: where the 45 ms between the measured vit_fwd
(111.8 ms at bs 32, UNCACHED_FLOOR.json) and its dense-matmul content
goes.

UNCACHED_FLOOR.json attributes the uncached step per *block* (towers vs
tail); this drills into the dominant block.  Rows, all measured with the
same two-length-scan + value-fetch slope as uncached_floor.py:

  * vit_dense_chain   - 12 layers of EXACTLY ViT-base's dense shapes
    (q/k/v/proj 768x768 + MLP 768x3072x768, residuals + gelu) at the
    uncached activation count (352 images x 197 tokens): the sustained
    ceiling for ViT-shaped dense work on this chip.
  * fused_attention   - ops/fused_attention.fused_mha isolated at the
    tower geometry (352, 197, 768, 12 heads): what the 12 attention
    calls cost beyond their projections.
  * layernorm_chain   - 25 carry-chained f32 LayerNorms at (69344, 768)
    (2 per layer + final): the elementwise/HBM tax of the pre-LN blocks.
  * vit_block_chain   - 12 layers of EXACTLY ViTBlock's composed math
    (LN -> q/k/v -> fused_mha -> proj + residual -> LN -> MLP + residual)
    with the same dtypes/casts, minus the model-level frame (patchify,
    position add, CLS concat, per-layer CLS taps, final LN).  The gap
    between this row and the sum of the three isolated components is the
    COMPOSITION tax (fusion boundaries around the Pallas attention call,
    relayouts); the gap between vit_fwd and this row is the model frame.
  * vit_fwd           - the full ViT forward re-measured in-process for a
    same-session baseline (matches UNCACHED_FLOOR's row).
  * unattributed_ms   - vit_fwd minus the three isolated components:
    composition tax + model frame (decomposed by vit_block_chain).

Writes VIT_ATTRIBUTION.json.  Usage:
    python scripts/vit_attribution.py [--steps 4]
"""

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

from uncached_floor import (V5E_BF16_PEAK_FLOPS, _timed_scan, make_trainer,
                            mfu, staged_inputs)


def vit_dense_chain(n_steps: int, peak):
    """12 layers of ViT-base's exact dense shapes as one carry-chained
    scan body (nothing hoists; weights are runtime args like the real
    model's params)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    M, D, F = 352 * 197, 768, 3072
    x = jnp.asarray(rng.standard_normal((M, D)) * 0.3, jnp.bfloat16)
    ws = {n: jnp.asarray(rng.standard_normal(sh) / np.sqrt(sh[0]),
                         jnp.bfloat16)
          for n, sh in [("q", (D, D)), ("k", (D, D)), ("v", (D, D)),
                        ("p", (D, D)), ("f1", (D, F)), ("f2", (F, D))]}

    def fn(taint, x_, ws_):
        y = x_ + taint.astype(x_.dtype)
        for _ in range(12):
            q, k, v = y @ ws_["q"], y @ ws_["k"], y @ ws_["v"]
            a = ((q + k + v) * 0.333).astype(jnp.bfloat16)
            y = (a @ ws_["p"] + y).astype(jnp.bfloat16)
            h = jax.nn.gelu((y @ ws_["f1"]).astype(jnp.bfloat16))
            y = ((h @ ws_["f2"]) + y).astype(jnp.bfloat16)
        return y

    sec, flops, _ = _timed_scan(fn, (x, ws), n_steps)
    return {"ms": sec * 1e3, "tflops": flops / 1e12,
            "mfu_vs_peak": mfu(flops, sec, peak),
            "shape": "12 x (q/k/v/proj 768^2 + MLP 768x3072x768) at "
                     "M=69344, residuals+gelu included"}


def fused_attention_isolated(n_steps: int, peak):
    """fused_mha at the uncached ViT tower geometry."""
    import jax.numpy as jnp

    from iisan_tpu.ops.fused_attention import fused_mha

    rng = np.random.default_rng(1)
    B, T, D = 352, 197, 768
    mk = lambda: jnp.asarray(rng.standard_normal((B, T, D)) * 0.3,
                             jnp.bfloat16)
    q, k, v = mk(), mk(), mk()

    def fn(taint, q_, k_, v_):
        t = taint.astype(q_.dtype)
        out = q_
        for _ in range(12):
            out = fused_mha(out + t, k_, v_, n_heads=12)
        return out

    sec, flops, _ = _timed_scan(fn, (q, k, v), n_steps)
    return {"ms": sec * 1e3, "tflops": flops / 1e12,
            "mfu_vs_peak": mfu(flops, sec, peak),
            "shape": f"12 chained fused_mha at ({B}, {T}, {D}), 12 heads",
            "note": "matches the 12 per-layer attention calls of one ViT "
                    "forward (QKV/out projections measured in the dense "
                    "chain row, not here)"}


def layernorm_chain(n_steps: int, peak):
    import jax.numpy as jnp
    from flax import linen as nn

    rng = np.random.default_rng(2)
    M, D = 352 * 197, 768
    x = jnp.asarray(rng.standard_normal((M, D)), jnp.bfloat16)
    ln = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32)
    params = ln.init(__import__("jax").random.PRNGKey(0),
                     x.astype(jnp.float32))["params"]

    def fn(taint, x_, params_):
        y = x_ + taint.astype(x_.dtype)
        for _ in range(25):
            y = ln.apply({"params": params_},
                         y.astype(jnp.float32)).astype(jnp.bfloat16)
        return y

    sec, flops, _ = _timed_scan(fn, (x, params), n_steps)
    return {"ms": sec * 1e3,
            "shape": "25 chained f32 LayerNorms at (69344, 768), bf16 "
                     "in/out (2 per layer + final, the ViT count)"}


def vit_block_chain(n_steps: int, peak):
    """12 composed ViTBlock bodies at the tower geometry: same per-layer
    math (LN/casts/attention/GEMMs/residuals) as models/vit.py:94-126,
    none of the model-level frame."""
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from iisan_tpu.ops.fused_attention import fused_mha

    rng = np.random.default_rng(3)
    B, T, D, F = 352, 197, 768, 3072
    x = jnp.asarray(rng.standard_normal((B, T, D)) * 0.3, jnp.bfloat16)
    ws = {n_: jnp.asarray(rng.standard_normal(sh) / np.sqrt(sh[0]),
                          jnp.bfloat16)
          for n_, sh in [("q", (D, D)), ("k", (D, D)), ("v", (D, D)),
                         ("p", (D, D)), ("f1", (D, F)), ("f2", (F, D))]}
    ln = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32)
    ln_params = ln.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, D), jnp.float32))["params"]

    def apply_ln(y, p):
        return ln.apply({"params": p}, y.astype(jnp.float32)
                        ).astype(jnp.bfloat16)

    def fn(taint, x_, ws_, lp):
        y = x_ + taint.astype(x_.dtype)
        for _ in range(12):
            h = apply_ln(y, lp)
            q, k, v = h @ ws_["q"], h @ ws_["k"], h @ ws_["v"]
            a = fused_mha(q, k, v, n_heads=12)
            y = (a @ ws_["p"]).astype(jnp.bfloat16) + y
            h = apply_ln(y, lp)
            h = jax.nn.gelu((h @ ws_["f1"]).astype(jnp.bfloat16),
                            approximate=False)
            y = (h @ ws_["f2"]).astype(jnp.bfloat16) + y
        return y

    sec, flops, _ = _timed_scan(fn, (x, ws, ln_params), n_steps)
    return {"ms": sec * 1e3, "tflops": flops / 1e12,
            "mfu_vs_peak": mfu(flops, sec, peak),
            "shape": "12 x (LN -> qkv -> fused_mha -> proj+res -> LN -> "
                     f"MLP+res) at ({B}, {T}, {D}), ViTBlock math"}


def vit_fwd_row(n_steps: int, peak, bs: int = 32):
    import jax.numpy as jnp

    tr = make_trainer(bs)
    model, params = tr.model, tr.params
    images, _ = staged_inputs(tr)

    def fn(taint, params_, images_):
        _, hid = model.apply(
            {"params": params_}, images_ + taint.astype(images_.dtype), True,
            method=lambda m, im, det: m.image_tower(im, det))
        return hid

    sec, flops, _ = _timed_scan(fn, (params, images), n_steps)
    return {"ms": sec * 1e3, "tflops": flops / 1e12,
            "mfu_vs_peak": mfu(flops, sec, peak)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--out", default="VIT_ATTRIBUTION.json")
    args = ap.parse_args()

    from iisan_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    kind = jax.devices()[0].device_kind
    peak = V5E_BF16_PEAK_FLOPS if "v5" in kind else None
    out = {"device_kind": kind, "peak_flops": peak,
           "method": "two-length scan slope, value-fetch timed "
                     "(scripts/uncached_floor.py docstring)"}
    for name, fn in [("vit_fwd", lambda: vit_fwd_row(args.steps, peak)),
                     ("vit_dense_chain",
                      lambda: vit_dense_chain(args.steps, peak)),
                     ("fused_attention",
                      lambda: fused_attention_isolated(args.steps, peak)),
                     ("layernorm_chain",
                      lambda: layernorm_chain(args.steps, peak)),
                     ("vit_block_chain",
                      lambda: vit_block_chain(args.steps, peak))]:
        out[name] = fn()
        print(json.dumps({name: out[name]}), flush=True)
        with open(args.out, "w") as fh:
            json.dump(out, fh, indent=1)
    parts = (out["vit_dense_chain"]["ms"] + out["fused_attention"]["ms"]
             + out["layernorm_chain"]["ms"])
    out["unattributed_ms"] = round(out["vit_fwd"]["ms"] - parts, 2)
    out["composition_tax_ms"] = round(out["vit_block_chain"]["ms"] - parts, 2)
    out["model_frame_ms"] = round(
        out["vit_fwd"]["ms"] - out["vit_block_chain"]["ms"], 2)
    out["note"] = ("unattributed = composition_tax (fusion boundaries / "
                   "relayouts around the Pallas attention inside a block, "
                   "= block_chain - sum(isolated parts)) + model_frame "
                   "(patchify projection+transpose, position add, CLS "
                   "concat, per-layer CLS taps, final LN, = vit_fwd - "
                   "block_chain)")
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"unattributed_ms": out["unattributed_ms"],
                      "wrote": args.out}))


if __name__ == "__main__":
    main()
