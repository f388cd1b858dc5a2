"""Fused-SAN Pallas kernel vs XLA cascade, per geometry.

Times forward+backward of the K-step gated adapter cascade at the base
(BERT/ViT-base) and Versa (Llama-3-70B 8192-dim) geometries, in the dtype
each path actually runs (bf16 activations).  The numbers decide the
``use_pallas`` default per geometry (VERDICT r1 weak #6 / next #7).

    python scripts/bench_pallas.py
"""

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def bench_one(n, k, d, r, dtype_str, n_iter=30):
    import jax
    import jax.numpy as jnp

    from iisan_tpu.ops.fused_san import fused_cascade, reference_cascade

    dt = jnp.dtype(dtype_str)
    rng = np.random.default_rng(0)
    gates = jnp.asarray(rng.standard_normal(k), jnp.float32)
    taps = jnp.asarray(rng.standard_normal((n, k, d)), dt)
    wd = jnp.asarray(rng.standard_normal((k, d, r)) * 0.01, dt)
    bd = jnp.zeros((k, r), dt)
    wu = jnp.asarray(rng.standard_normal((k, r, d)) * 0.01, dt)
    bu = jnp.zeros((k, d), dt)
    c0 = jnp.zeros((n, d), dt)

    def loss(run, gates, wd, bd, wu, bu):
        out = run(gates, taps, wd, bd, wu, bu, c0)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    results = {}
    for name, run in (("xla", reference_cascade), ("pallas", fused_cascade)):
        f = jax.jit(jax.grad(lambda *a: loss(run, *a), argnums=(0, 1, 3)))
        out = f(gates, wd, bd, wu, bu)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(n_iter):
            out = f(gates, wd, bd, wu, bu)
        jax.block_until_ready(out)
        results[name] = (time.time() - t0) / n_iter * 1e3  # ms
    return results


def main():
    geoms = [
        ("base (K7 D768 R64, N=704)", 704, 7, 768, 64),
        ("versa (K7 D8192 R64, N=704)", 704, 7, 8192, 64),
        ("versa-wide-R (K7 D8192 R128, N=704)", 704, 7, 8192, 128),
        # N=2048 stands in for the catalog-scale eval pass; N=8192 grad
        # compiles take tens of minutes over the tunnel.
        ("versa-eval (K7 D8192 R64, N=2048)", 2048, 7, 8192, 64),
    ]
    report = {}
    for label, n, k, d, r in geoms:
        res = bench_one(n, k, d, r, "bfloat16")
        report[label] = {k2: round(v, 3) for k2, v in res.items()}
        report[label]["pallas_speedup"] = round(res["xla"] / res["pallas"], 2)
        print(f"{label}: xla {res['xla']:.3f} ms  pallas {res['pallas']:.3f} ms"
              f"  speedup {res['xla'] / res['pallas']:.2f}x", flush=True)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
