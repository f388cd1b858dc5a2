"""Serving benchmark: top-K recommendation latency / throughput on TPU.

The reference has no serving path (its evaluation doubles as inference,
SURVEY.md section 4); this repo adds one (iisan_tpu/serve.py).  This
script measures it at production geometry: the published user-tower
config (embedding_dim 64, 2-block SASRec, seq len 10) over
Scientific-scale and 5x-larger catalogs.

Two numbers matter and they are reported separately:

  * per-call latency — host-observed wall time of ``Recommender.top_k``
    including the host->device->host round trip.  On this environment
    the device is reached through the axon tunnel, whose ~30 ms
    round-trip dominates small batches (a colocated deployment would
    not pay it); medians over many calls are reported for robustness.
  * device throughput — users/s from large-batch dispatches, where
    compute amortizes the dispatch overhead.

Usage:  python scripts/serve_bench.py [--out SERVE_BENCH.json]
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def build_recommender(catalog: int, dim: int = 64, seq_len: int = 10,
                      seed: int = 0):
    """Recommender at serving geometry without a trainer: init just the
    user-encoder params (the only module top_k applies) and a random
    fused item table — same compute as a trained artifact."""
    import jax
    import jax.numpy as jnp

    from iisan_tpu.models.model import IISANRecModel
    from iisan_tpu.models.san import SideAdapterNetwork
    from iisan_tpu.serve import Recommender

    model = IISANRecModel(
        san=SideAdapterNetwork(embedding_dim=dim), embedding_dim=dim,
        max_seq_len=seq_len, num_attention_heads=2, transformer_block=2,
        drop_rate=0.0)
    rng = np.random.default_rng(seed)
    table = jnp.asarray(rng.standard_normal((catalog + 1, dim),
                                            dtype=np.float32))
    embs = jnp.zeros((2, seq_len, dim), jnp.float32)
    mask = jnp.ones((2, seq_len), jnp.float32)
    params = model.init(jax.random.PRNGKey(seed), embs, mask,
                        method=model.user_scores)["params"]
    return Recommender(model, params, table, seq_len)


def random_seqs(rng, batch: int, catalog: int, seq_len: int):
    return [[int(x) for x in rng.integers(1, catalog + 1, seq_len)]
            for _ in range(batch)]


def bench_latency(rec, catalog: int, batch: int, k: int = 10,
                  warmup: int = 5, calls: int = 50):
    rng = np.random.default_rng(1)
    batches = [random_seqs(rng, batch, catalog, rec.max_seq_len)
               for _ in range(warmup + calls)]
    for i in range(warmup):
        rec.top_k(batches[i], k=k)
    times = []
    for i in range(warmup, warmup + calls):
        t0 = time.perf_counter()
        ids, _ = rec.top_k(batches[i], k=k)   # np.asarray inside blocks
        times.append(time.perf_counter() - t0)
    assert ids.shape == (batch, k)
    ms = np.array(times) * 1e3
    return {"batch": batch, "catalog": catalog, "k": k, "calls": calls,
            "p50_ms": round(float(np.percentile(ms, 50)), 3),
            "p95_ms": round(float(np.percentile(ms, 95)), 3),
            "mean_ms": round(float(ms.mean()), 3),
            "users_per_s_p50": round(batch / float(np.percentile(ms, 50))
                                     * 1e3, 1)}


def bench_http(rec, catalog: int, batch: int, k: int = 10,
               warmup: int = 5, calls: int = 30):
    """End-to-end HTTP latency of the --http mode on localhost (adds
    JSON + socket overhead on top of the device dispatch)."""
    import json as _json
    import threading
    import urllib.request

    from iisan_tpu.serve import serve_http

    server = serve_http(rec, "127.0.0.1", 0, max_batch=max(batch, 256))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    rng = np.random.default_rng(2)
    try:
        times = []
        for i in range(warmup + calls):
            payload = _json.dumps({"sequences": random_seqs(
                rng, batch, catalog, rec.max_seq_len), "k": k}).encode()
            t0 = time.perf_counter()
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/recommend", data=payload)
            with urllib.request.urlopen(req) as r:
                out = _json.loads(r.read())
            if i >= warmup:
                times.append(time.perf_counter() - t0)
        assert len(out["items"]) == batch
    finally:
        server.shutdown()
    ms = np.array(times) * 1e3
    return {"batch": batch, "catalog": catalog, "transport": "http",
            "p50_ms": round(float(np.percentile(ms, 50)), 3),
            "p95_ms": round(float(np.percentile(ms, 95)), 3)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="SERVE_BENCH.json")
    ap.add_argument("--catalogs", default="21000,100000")
    ap.add_argument("--batches", default="1,32,256,2048")
    ap.add_argument("--quant", default="none",
                    help="comma list of table modes to bench into one "
                         "artifact (none = bf16/fp32 table, int8 = "
                         "quantized); 'none,int8' gives the direct "
                         "same-file comparison")
    ap.add_argument("--http", action="store_true",
                    help="also measure localhost HTTP round-trip rows")
    args = ap.parse_args()
    quants = args.quant.split(",")
    for q in quants:
        if q not in ("none", "int8"):
            ap.error(f"unknown --quant mode {q!r}")

    import jax

    platform = jax.devices()[0].platform
    rows = []
    for catalog in [int(c) for c in args.catalogs.split(",")]:
        base_rec = build_recommender(catalog)
        for quant in quants:
            rec = base_rec.quantize_table() if quant == "int8" else base_rec
            for batch in [int(b) for b in args.batches.split(",")]:
                row = bench_latency(rec, catalog, batch)
                row["quant"] = quant
                rows.append(row)
                print(f"catalog {catalog:>6} batch {batch:>5} "
                      f"[{quant:>4}]: "
                      f"p50 {row['p50_ms']:7.2f} ms  "
                      f"p95 {row['p95_ms']:7.2f} ms"
                      f"  {row['users_per_s_p50']:>9} users/s", flush=True)
                if args.http:
                    hrow = bench_http(rec, catalog, batch)
                    hrow["quant"] = quant
                    rows.append(hrow)
                    print(f"  http            : p50 {hrow['p50_ms']:7.2f} ms"
                          f"  p95 {hrow['p95_ms']:7.2f} ms", flush=True)
    out = {"platform": platform,
           "note": ("latency includes the axon-tunnel host round trip "
                    "(~30 ms floor on this environment); large batches "
                    "give the device-throughput view"),
           "geometry": {"embedding_dim": 64, "transformer_block": 2,
                        "seq_len": 10, "k": 10},
           "rows": rows}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
