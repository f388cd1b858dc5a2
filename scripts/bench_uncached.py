"""Uncached-mode throughput benchmark: frozen towers in-graph
(the reference's Code_Uncached hot path), measured honestly.

Two numbers:
  * device users/s — N train steps inside ONE jitted lax.scan on
    pre-staged data, block_until_ready'd, with MFU computed from the
    compiled executable's own FLOP count (UncachedTrainer.device_bench).
    No async-dispatch gaps, no hand-derived FLOPs.
  * e2e users/s — full epoch through the threaded host image loader.
    On the tunneled v5e this is dominated by moving the uint8 image batch
    over the tunnel (~211 MB/step at bs=32); a locally-attached TPU does
    not pay that, so the device number is the hardware's story and the e2e
    number is this link's.

Reference context (README.md:35): full fine-tuning takes 443 s/epoch on an
A100 (12,076 users -> ~27 users/s). Driver target: >= 3x PyTorch samples/s.

Prints one JSON line (secondary metric; the primary bench is bench.py,
which also embeds these fields).
"""

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np

V5E_BF16_PEAK_FLOPS = 197e12  # TPU v5e (v5 lite) bf16 peak per chip


def run_uncached_bench(n_users=512, batch_size=32, n_steps=10,
                       measure_e2e=True, tower_quant="none"):
    from iisan_tpu.config import IISANConfig
    from iisan_tpu.data.images import SyntheticImageStore
    from iisan_tpu.data.synthetic import synthetic_corpus
    from iisan_tpu.train.uncached import UncachedTrainer

    cfg = IISANConfig(
        pipeline="uncached", batch_size=batch_size, epoch=1, embedding_dim=64,
        adapter_type="IISAN", adding_adapter_to="all", fine_tune_to="None",
        side_adapter_vit_list="1,3,5,7,9,11",
        side_adapter_bert_list="1,3,5,7,9,11",
        lr=2e-4, adapter_cv_lr=1e-4, adapter_bert_lr=1e-4, seed=12345,
        tower_quant=tower_quant)
    corpus = synthetic_corpus(n_users=n_users, item_num=800, seed=0)
    rng = np.random.default_rng(0)
    tokens = np.zeros((corpus.item_num + 1, 60), np.int32)
    tokens[1:, :30] = rng.integers(1, 30000, size=(corpus.item_num, 30))
    tokens[1:, 30:] = 1
    tr = UncachedTrainer(cfg, corpus, tokens, SyntheticImageStore(224))

    b = tr.device_bench(n_steps)
    sec_per_step, flops_per_step = b["seconds_per_step"], b["flops_per_step"]
    users_per_sec = b["users_per_sec"]
    import jax
    kind = jax.devices()[0].device_kind
    peak = V5E_BF16_PEAK_FLOPS if "v5" in kind else None
    mfu = flops_per_step / sec_per_step / peak if peak else None

    out = {
        "uncached_device_users_per_sec": round(users_per_sec, 2),
        "uncached_step_ms": round(sec_per_step * 1e3, 2),
        "uncached_tflops_per_step": round(flops_per_step / 1e12, 3),
        "uncached_mfu": round(mfu, 4) if mfu is not None else None,
        "uncached_step_memory_mb": round(b["memory_bytes"] / 2**20, 1)
        if b["memory_bytes"] else None,
        "device_kind": kind,
    }
    if measure_e2e:
        tr.run_epoch(0)  # compile + warm the per-batch path
        t0 = time.time()
        tr.run_epoch(1)
        out["uncached_e2e_users_per_sec"] = round(
            n_users / (time.time() - t0), 2)
    ref_fft = 12076 / 443.0  # A100 FFT epoch, README.md:35
    out["vs_fft_a100"] = round(users_per_sec / ref_fft, 2)
    return out


def main():
    from iisan_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    res = run_uncached_bench()
    res["metric"] = "uncached_users_per_sec"
    res["value"] = res["uncached_device_users_per_sec"]
    res["unit"] = "users/s"
    print(json.dumps(res))


if __name__ == "__main__":
    main()
