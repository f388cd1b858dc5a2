"""Attention-implementation shoot-out at the BERT tower's uncached
geometry: module XLA vs fused_mha vs fused_attn_subblock.

Why a separate measurement from VIT_BLOCK_VARIANTS.json: the subblock
kernel lost 3.7% at the ViT geometry (352, 197, 768) where attention is
compute-heavy, but BERT's title encoding runs at T=30 — tiny-shape
attention where per-op dispatch and layout taxes dominate compute (the
same regime where ops/fused_user_encoder.py's kernels win).  This pins
the verdict for the text tower instead of extrapolating ViT's.

Measures the REAL BertEncoder module (12 layers, 768 wide, CLS collect,
bf16 activations) at the uncached item-batch geometry (352, 30) under
fused_attention in {False, True, "subblock"}, eval mode and train mode
(HF BERT dropout 0.1 — the reference trains its frozen towers
un-eval()ed, Code_Uncached/run.py:79-81, so train-mode rows are what the
uncached step actually pays).  One param tree serves all variants
(wiring keeps the module-path layout — tests/test_fused_attn_subblock.py).

Writes BERT_ATTN_VARIANTS.json (merge-preserving).  Usage:
    python scripts/bert_attn_variants.py [--steps 6] [--variants a,b]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

from uncached_floor import V5E_BF16_PEAK_FLOPS, _timed_scan, mfu

B, T, D = 352, 30, 768
VARIANTS = {"xla": False, "fused_mha": True, "subblock": "subblock",
            "subblock_v2": "subblock_v2"}


def make_fn(fused, train: bool):
    import jax
    import jax.numpy as jnp

    from iisan_tpu.models.bert import BertEncoder

    enc = BertEncoder(hidden_dim=D, num_layers=12, num_heads=12,
                      intermediate_dim=4 * D, dtype=jnp.bfloat16,
                      dropout=0.1, collect="cls",
                      fused_attention=fused)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 30000, (B, T)), jnp.int32)
    # realistic padding: titles span 5..30 tokens
    lens = rng.integers(5, T + 1, (B, 1))
    mask = jnp.asarray(np.arange(T)[None, :] < lens, jnp.int32)
    init_enc = BertEncoder(hidden_dim=D, num_layers=12, num_heads=12,
                           intermediate_dim=4 * D, dtype=jnp.bfloat16,
                           dropout=0.1, collect="cls",
                           fused_attention=False)
    params = init_enc.init(jax.random.PRNGKey(0), ids, mask)
    key = jax.random.PRNGKey(7)

    def fn(taint, ids_, mask_, params_, key_):
        ids_t = ids_ + taint  # taint: runtime 0, compile-time opaque
        if train:
            rngs = {"dropout": jax.random.fold_in(key_, taint)}
            _, hidden = enc.apply(params_, ids_t, mask_,
                                  deterministic=False, rngs=rngs)
        else:
            _, hidden = enc.apply(params_, ids_t, mask_)
        return hidden

    return fn, (ids, mask, params, key)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--out", default="BERT_ATTN_VARIANTS.json")
    ap.add_argument("--variants", default=",".join(VARIANTS))
    args = ap.parse_args()

    from iisan_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    kind = jax.devices()[0].device_kind
    peak = V5E_BF16_PEAK_FLOPS if "v5" in kind else None
    out = {}
    if os.path.exists(args.out):
        with open(args.out) as fh:
            out = json.load(fh)
    out.update(device_kind=kind,
               method="two-length scan slope (scripts/uncached_floor.py); "
                      f"real BertEncoder fwd, 12 layers at ({B}, {T}, {D}) "
                      "bf16, CLS collect; train rows = dropout 0.1 active")
    for name in args.variants.split(","):
        for mode, train in (("eval", False), ("train", True)):
            fn, args_ = make_fn(VARIANTS[name], train)
            sec, flops, _ = _timed_scan(fn, args_, args.steps)
            row = {"ms": round(sec * 1e3, 3), "tflops": flops / 1e12,
                   "mfu_vs_peak": mfu(flops, sec, peak)}
            if name != "xla":
                row["flops_basis_caveat"] = (
                    "XLA cost analysis cannot see inside Pallas kernels; "
                    "tflops/mfu count only the non-Pallas remainder - "
                    "compare ms, not mfu")
            out[f"{name}_{mode}"] = row
            print(json.dumps({f"{name}_{mode}": row}), flush=True)
            with open(args.out, "w") as fh:
                json.dump(out, fh, indent=1)
    for mode in ("eval", "train"):
        base = out.get(f"fused_mha_{mode}", {}).get("ms")
        for name in VARIANTS:
            k = f"{name}_{mode}"
            if base is not None and k in out and name != "fused_mha":
                out[k]["saved_ms_vs_fused_mha"] = round(
                    base - out[k]["ms"], 2)
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"wrote": args.out}))


if __name__ == "__main__":
    main()
