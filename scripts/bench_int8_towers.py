"""Int8 frozen-tower A/B: W8A8 towers (tower_quant='int8') vs bf16 at the
published uncached geometry, measured on the real chip.

Rows per batch size: device step ms, users/s, executable memory, FLOPs
(XLA counts the int8 dot at the same 2*M*N*K, so 'tflops' is the
*effective* rate — the hardware rate doubles), plus a same-weights tap
relative-error row at the real BERT-base/ViT-base geometry quantifying
what int8 does to the SAN's inputs.

Writes INT8_TOWER_AB.json.  Usage:
    python scripts/bench_int8_towers.py [--batches 32,64] [--steps 10] \
        [--quants none,int8]

--quants selects the tower_quant modes measured; speedup keys are named
speedup_bs{B} for int8 and speedup_bs{B}_{quant} otherwise.  (The former
'int8_pallas' mode was demoted to a negative result — the fused kernel
loses at every tower geometry, see ops/int8_pallas.py STATUS and the
INT8_IMPL_BENCH.json sweep; measure it directly via bench_int8_impls.py.)
"""

import json
import sys

sys.path.insert(0, ".")

import numpy as np


def tap_error_at_real_geometry(seed=0, batch=8):
    """Same random bf16-scale weights, int8 vs float towers: relative
    error of the (K, D) CLS taps the SAN consumes (BERT-base + ViT-base,
    224px / 30 tokens)."""
    import jax
    import jax.numpy as jnp

    from iisan_tpu.config import IISANConfig
    from iisan_tpu.models.towers import towers_from_config
    from iisan_tpu.ops.int8_linear import quantize_dense_tree

    cfg_f = IISANConfig(pipeline="uncached", adapter_type="IISAN",
                        adding_adapter_to="all", fine_tune_to="None",
                        tower_dropout=0.0, compute_dtype="float32")
    cfg_i = cfg_f.replace(tower_quant="int8")
    text_f, image_f = towers_from_config(cfg_f)
    text_i, image_i = towers_from_config(cfg_i)

    rng = np.random.default_rng(seed)
    images = jnp.asarray(rng.standard_normal((batch, 224, 224, 3)) * 0.5,
                         jnp.float32)
    tokens = np.zeros((batch, 60), np.int32)
    tokens[:, :30] = rng.integers(1, 30000, size=(batch, 30))
    tokens[:, 30:] = 1
    tokens = jnp.asarray(tokens)

    key = jax.random.PRNGKey(seed)
    pv_f = image_f.init({"params": key}, images, True)["params"]
    pt_f = text_f.init({"params": key}, tokens, True)["params"]
    pv_i = dict(pv_f)
    pv_i["vit"] = quantize_dense_tree(
        jax.tree_util.tree_map(np.asarray, pv_f["vit"]))
    pt_i = dict(pt_f)
    pt_i["bert"] = quantize_dense_tree(
        jax.tree_util.tree_map(np.asarray, pt_f["bert"]))

    out = {}
    for name, (mod_f, mod_i, p_f, p_i, x) in {
        "vit": (image_f, image_i, pv_f, pv_i, images),
        "bert": (text_f, text_i, pt_f, pt_i, tokens),
    }.items():
        _, h_f = mod_f.apply({"params": p_f}, x, True)
        _, h_i = mod_i.apply({"params": p_i}, x, True)
        h_f, h_i = np.asarray(h_f, np.float32), np.asarray(h_i, np.float32)
        out[f"{name}_tap_rel_err"] = round(float(
            np.linalg.norm(h_i - h_f) / np.linalg.norm(h_f)), 5)
    return out


def main():
    import argparse

    from iisan_tpu.utils.compile_cache import enable_compilation_cache
    from bench_uncached import run_uncached_bench

    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="32,64")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--quants", default="none,int8",
                    help="comma list of tower_quant modes to measure "
                         "(none, int8)")
    ap.add_argument("--out", default="INT8_TOWER_AB.json")
    args = ap.parse_args()
    enable_compilation_cache()

    import jax

    report = {"device_kind": jax.devices()[0].device_kind,
              "geometry": "BERT-base + ViT-base/16 224px, IISAN uncached",
              "rows": []}
    for bs in [int(b) for b in args.batches.split(",")]:
        for quant in args.quants.split(","):
            r = run_uncached_bench(batch_size=bs, n_steps=args.steps,
                                   measure_e2e=False, tower_quant=quant)
            r.update(batch_size=bs, tower_quant=quant)
            if "pallas" in quant:
                # XLA's executable cost analysis cannot see inside a
                # Pallas kernel, so these fields count only the
                # non-Pallas remainder of the step (VERDICT r3 weak #4)
                r["flops_basis_caveat"] = (
                    "uncached_tflops_per_step / uncached_mfu EXCLUDE the "
                    "Pallas kernel's FLOPs (invisible to XLA cost "
                    "analysis); only step_ms / users_per_sec / memory are "
                    "comparable across rows")
            report["rows"].append(r)
            print(json.dumps(r))
    report["tap_error"] = tap_error_at_real_geometry()
    print(json.dumps(report["tap_error"]))
    rows = {(r["batch_size"], r["tower_quant"]): r for r in report["rows"]}
    for bs in sorted({r["batch_size"] for r in report["rows"]}):
        base = rows.get((bs, "none"))
        if base is None:
            continue
        for quant in args.quants.split(","):
            q = rows.get((bs, quant))
            if quant == "none" or q is None:
                continue
            suffix = "" if quant == "int8" else f"_{quant}"
            report[f"speedup_bs{bs}{suffix}"] = round(
                q["uncached_device_users_per_sec"]
                / base["uncached_device_users_per_sec"], 3)
    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps({"wrote": args.out,
                      **{k: v for k, v in report.items()
                         if k.startswith("speedup")}}))


if __name__ == "__main__":
    main()
