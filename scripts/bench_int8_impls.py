"""Int8 linear implementation shoot-out at the uncached tower geometry.

Measures a 12-layer dense tower stack (q/k/v/proj 768x768 + MLP
768x3072x768, residuals and gelu included, M = 69632 rows = the padded
uncached ViT activation count) as ONE jitted chain — per-dispatch tunnel
overhead amortized — for three implementations:

  * bf16: plain nn.Dense math (the tower_quant='none' path),
  * int8_xla: ops/int8_linear.int8_matmul (tower_quant='int8'),
  * int8_pallas: ops/int8_pallas.fused_w8a8_matmul (demoted from the
    user-facing tower_quant values — see the STATUS note in
    ops/int8_pallas.py; measured here directly).

This is the measurement behind the impl default: XLA pipelines the
quantize/dequant into its matmul fusions better than the hand-written
one-pass kernel, so 'int8' (XLA) is the default and the Pallas kernel is
opt-in.  Writes INT8_IMPL_BENCH.json.

--sweep additionally measures single W8A8 matmuls across widths up to
IISAN-Versa's 8192 (Llama-3-70B hidden size) to settle whether the Pallas
kernel's claimed wide-matmul headroom exists anywhere on this chip
(VERDICT r3 next #3): rows land under "sweep" in the same artifact.

Usage: python scripts/bench_int8_impls.py [--layers 12] [--iters 10]
                                          [--sweep]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def sweep_wide(iters: int):
    """Single-matmul shoot-out y = x @ W at K = N in {768..8192}:
    the crossover question 'does the one-pass kernel ever beat XLA's
    pipelined quantize->s8-dot->dequant fusions on this chip'."""
    import jax
    import jax.numpy as jnp

    from iisan_tpu.ops.int8_linear import int8_matmul, quantize_kernel
    from iisan_tpu.ops.int8_pallas import fused_w8a8_matmul, supported

    rng = np.random.default_rng(1)
    rows = []
    for K in (768, 2048, 4096, 8192):
        N = K
        for M in (8192, 32768):
            x = jnp.asarray(rng.standard_normal((M, K)) * 0.3, jnp.bfloat16)
            w = rng.standard_normal((K, N)).astype(np.float32) / np.sqrt(K)
            q, s = quantize_kernel(w)
            wb = jnp.asarray(w, jnp.bfloat16)
            q, s = jnp.asarray(q), jnp.asarray(s)
            fns = {"bf16": jax.jit(lambda x: (x @ wb).astype(jnp.bfloat16)),
                   "int8_xla": jax.jit(lambda x: int8_matmul(
                       x, q, s, None, jnp.bfloat16))}
            if supported(K, N):
                fns["int8_pallas"] = jax.jit(lambda x: fused_w8a8_matmul(
                    x, q, s, None, jnp.bfloat16))
            row = {"M": M, "K": K, "N": N}
            for name, f in fns.items():
                f(x).block_until_ready()
                t0 = time.perf_counter()
                for _ in range(iters):
                    y = f(x)
                y.block_until_ready()
                dt = (time.perf_counter() - t0) / iters
                row[name + "_ms"] = round(dt * 1e3, 3)
                row[name + "_tflops_effective"] = round(
                    2 * M * K * N / dt / 1e12, 1)
            if "int8_pallas" not in fns:
                row["int8_pallas_ms"] = None
                row["note"] = "pallas unsupported at this geometry"
            else:
                row["pallas_vs_xla"] = round(
                    row["int8_xla_ms"] / row["int8_pallas_ms"], 3)
            rows.append(row)
            print(json.dumps(row), flush=True)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=12)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--rows", type=int, default=69632)
    ap.add_argument("--sweep", action="store_true",
                    help="add the wide-geometry (Versa 8192) K=N sweep")
    ap.add_argument("--out", default="INT8_IMPL_BENCH.json")
    args = ap.parse_args()

    from iisan_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from iisan_tpu.ops.int8_linear import int8_matmul, quantize_kernel
    from iisan_tpu.ops.int8_pallas import fused_w8a8_matmul

    rng = np.random.default_rng(0)
    M, D, F = args.rows, 768, 3072
    x = jnp.asarray(rng.standard_normal((M, D)) * 0.3, jnp.bfloat16)

    def mk(shape):
        w = rng.standard_normal(shape).astype(np.float32) / np.sqrt(shape[0])
        q, s = quantize_kernel(w)
        return jnp.asarray(w, jnp.bfloat16), jnp.asarray(q), jnp.asarray(s)

    Ws = {n: mk(sh) for n, sh in [("q", (D, D)), ("k", (D, D)),
                                  ("v", (D, D)), ("p", (D, D)),
                                  ("f1", (D, F)), ("f2", (F, D))]}

    def layer(y, lin):
        q, k, v = lin(y, "q"), lin(y, "k"), lin(y, "v")
        a = (q + k + v) * 0.333
        y = lin(a, "p") + y
        h = jax.nn.gelu(lin(y, "f1"))
        return (lin(h, "f2") + y).astype(jnp.bfloat16)

    lins = {
        "bf16": lambda y, n: (y @ Ws[n][0]).astype(jnp.bfloat16),
        "int8_xla": lambda y, n: int8_matmul(
            y, Ws[n][1], Ws[n][2], None, jnp.bfloat16),
        "int8_pallas": lambda y, n: fused_w8a8_matmul(
            y, Ws[n][1], Ws[n][2], None, jnp.bfloat16),
    }
    flops = (2 * M * D * D * 4 + 2 * M * D * F * 2) * args.layers
    report = {"device_kind": jax.devices()[0].device_kind,
              "rows": M, "layers": args.layers,
              "geometry": "q/k/v/proj 768x768 + MLP 768x3072x768",
              "impls": {}}
    for name, lin in lins.items():
        @jax.jit
        def f(x, lin=lin):
            y = x
            for _ in range(args.layers):
                y = layer(y, lin)
            return y

        f(x).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(args.iters):
            y = f(x)
        y.block_until_ready()
        dt = (time.perf_counter() - t0) / args.iters
        row = {"ms": round(dt * 1e3, 3),
               "tflops_effective": round(flops / dt / 1e12, 1)}
        report["impls"][name] = row
        print(json.dumps({name: row}), flush=True)
    base = report["impls"]["bf16"]["ms"]
    for name, row in report["impls"].items():
        row["speedup_vs_bf16"] = round(base / row["ms"], 3)
    if args.sweep:
        report["sweep"] = sweep_wide(args.iters)
        wins = [r for r in report["sweep"]
                if r.get("pallas_vs_xla") and r["pallas_vs_xla"] > 1.0]
        report["sweep_verdict"] = (
            f"pallas wins at {len(wins)}/{len(report['sweep'])} geometries"
            if wins else
            "pallas never beats int8_xla at any measured geometry up to "
            "Versa's 8192 width - kernel kept as a documented negative "
            "result, config value removed (VERDICT r3 next #3)")
    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps({"wrote": args.out}))


if __name__ == "__main__":
    main()
