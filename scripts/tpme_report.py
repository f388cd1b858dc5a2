"""TPME comparison across methods - the paper's efficiency table, shipped.

Runs every method in its own subprocess (scripts/tpme_single.py), collects
(t, p, m) per method, scores TPME with the paper weights alpha =
(0.45, 0.10, 0.45) (README.md:91-96, figs/efficiency-metric.png), prints a
table and writes TPME.json at the repo root.

    python scripts/tpme_report.py [method ...] [--merge] [--users N]
        [--lmdb PATH]

Default methods: all six.  --merge starts from prior TPME.json /
TPME_partial.json records for methods not re-measured now.  --users N and
--lmdb PATH are forwarded to tpme_single.py: --users sizes the host-fed
e2e epoch (12076 = a full unscaled Scientific epoch); --lmdb feeds it
from a reference-layout LMDB catalog (real host decode path; build one
with scripts/make_synth_lmdb.py) instead of in-memory synthetic pixels.
"""

import json
import subprocess
import sys

sys.path.insert(0, ".")

METHODS = ["iisan_cached", "iisan_uncached", "fft", "lora", "houlsby",
           "bitfit"]


def main():
    args = [a for a in sys.argv[1:] if a != "--merge"]
    merge = "--merge" in sys.argv[1:]
    extra = []  # forwarded to tpme_single (e.g. --users 12076, --lmdb p)
    for flag in ("--users", "--lmdb"):
        if flag in args:
            i = args.index(flag)
            extra += args[i:i + 2]
            del args[i:i + 2]
    methods = args or METHODS
    records = []
    prior = {}
    if merge:
        # Start from prior results (fresher TPME_partial.json wins over
        # TPME.json) for methods NOT being re-measured now.
        import os
        if os.path.exists("TPME.json"):
            with open("TPME.json") as f:
                for r in json.load(f)["records"]:
                    prior[r["label"]] = r
        if os.path.exists("TPME_partial.json"):
            with open("TPME_partial.json") as f:
                for r in json.load(f):
                    prior[r["label"]] = r
        records = [r for lbl, r in prior.items() if lbl not in set(methods)]
    for m in methods:
        print(f"measuring {m} ...", flush=True)
        res = subprocess.run(
            [sys.executable, "scripts/tpme_single.py", m, *extra],
            capture_output=True, text=True)
        if res.returncode != 0 and "RESOURCE_EXHAUSTED" in res.stderr:
            # Doesn't fit one v5e at reference batch size -> retry with
            # tower rematerialization in a fresh process.  One extra
            # attempt tolerates transient tunnel/compile-service flakes.
            for attempt in range(2):
                print("  OOM - retrying with remat_towers", flush=True)
                res = subprocess.run(
                    [sys.executable, "scripts/tpme_single.py", m, "--remat",
                     *extra],
                    capture_output=True, text=True)
                if res.returncode == 0 or "RESOURCE_EXHAUSTED" in res.stderr:
                    break
        if res.returncode != 0:
            print(f"  FAILED: {res.stderr[-1500:]}", file=sys.stderr)
            if m in prior:
                # Keep the previously measured record rather than dropping
                # the method from the merged output (ADVICE r1).
                print(f"  keeping prior record for {m}", flush=True)
                records.append(prior[m])
            continue
        rec = json.loads(res.stdout.strip().splitlines()[-1])
        records.append(rec)
        mem = rec.get('memory_bytes')
        mem_str = f"{mem / 2**20:.0f} MiB" if mem is not None else "n/a"
        print(f"  epoch {rec['epoch_seconds']:.2f}s  "
              f"params {rec['trainable_params']:,}  "
              f"mem {mem_str}", flush=True)
        # Crash-resilience: persist each record as it lands so a killed run
        # can be resumed per-method and merged.
        with open("TPME_partial.json", "w") as f:
            json.dump(records, f, indent=1)

    from iisan_tpu.utils.tpme import ALPHA, RunRecord, tpme_scores

    runs = [RunRecord(r["label"], r["epoch_seconds"], r["trainable_params"],
                      r.get("memory_bytes")) for r in records]
    scores = tpme_scores(runs)
    print(f"\nTPME (alpha={ALPHA}; lower is better)")
    print(f"{'method':<16}{'epoch_s':>10}{'params':>14}{'mem_MiB':>10}{'TPME':>8}")
    for r in sorted(records, key=lambda r: scores[r["label"]]):
        mem = r.get('memory_bytes')
        mem_col = f"{mem / 2**20:.0f}" if mem is not None else "n/a"
        print(f"{r['label']:<16}{r['epoch_seconds']:>10.2f}"
              f"{r['trainable_params']:>14,}"
              f"{mem_col:>10}"
              f"{scores[r['label']]:>8.3f}")
    out = {"alpha": list(ALPHA), "records": records, "tpme": scores}
    with open("TPME.json", "w") as f:
        json.dump(out, f, indent=1)
    print("\nwritten TPME.json")


if __name__ == "__main__":
    main()
