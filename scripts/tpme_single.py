"""Measure one method's TPME inputs (t, p, m) in an isolated process.

Called per method by scripts/tpme_report.py so compile state and memory
accounting never leak between methods.  Prints ONE json line:
{label, epoch_seconds, trainable_params, memory_bytes, ...}.

Timing is device-bound (jitted scan, blocked) and scaled to the Amazon
Scientific epoch (12,076 users) at each method's reference batch size, so
the numbers compare the way the paper's Table does (README.md:91-96);
memory is the compiled train executable's footprint (arguments +
activations + outputs), the analytic analog of torch.cuda
max_memory_allocated.

    python scripts/tpme_single.py iisan_cached|iisan_uncached|fft|lora|houlsby|bitfit
"""

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np

SCIENTIFIC_USERS = 12076  # Dataset/Scientific scale (BASELINE.md)


def measure_cached():
    from iisan_tpu.config import IISANConfig
    from iisan_tpu.data.synthetic import synthetic_corpus, synthetic_taps
    from iisan_tpu.train.cached import CachedTrainer
    from iisan_tpu.utils.tpme import compiled_memory_bytes, trainable_param_count

    cfg = IISANConfig(batch_size=64, epoch=1, embedding_dim=64, seed=12345)
    corpus = synthetic_corpus(n_users=SCIENTIFIC_USERS, item_num=20825, seed=0)
    k = len(cfg.san_image_taps())
    tr = CachedTrainer(cfg, corpus, synthetic_taps(20825, k, 768, seed=1),
                       synthetic_taps(20825, k, 768, seed=2))
    import jax

    perm = tr._put(tr.epoch_permutation(0), tr._perm_sh)
    tables = (tr.cv_table, tr.text_table, tr.train_seqs,
              tr.train_log_mask, tr.pop_prob)
    compiled = tr._epoch_fn.lower(tr.params, tr.opt_state, tr.rng, perm,
                                  tables).compile()
    mem = compiled_memory_bytes(compiled)
    tr.run_epoch(0)  # warm
    times = []
    for ep in range(1, 4):
        t0 = time.time()
        tr.run_epoch(ep)
        jax.block_until_ready(tr.params)
        times.append(time.time() - t0)
    return {
        "label": "iisan_cached",
        "epoch_seconds": float(np.median(times)),
        "epoch_seconds_basis": "MEASURED full epochs at Scientific scale "
                               "(12,076 users; median of 3)",
        "trainable_params": trainable_param_count(tr),
        "memory_bytes": mem,
        "batch_size": cfg.batch_size,
    }


def _image_store():
    """--lmdb PATH: feed the e2e epoch from a reference-layout LMDB
    catalog (real host decode path: LMDB read -> pickle -> resize ->
    normalize; build one with scripts/make_synth_lmdb.py).  Default stays
    SyntheticImageStore (in-memory RNG pixels, no decode)."""
    from iisan_tpu.data.images import LmdbImageStore, SyntheticImageStore

    if "--lmdb" in sys.argv:
        i = sys.argv.index("--lmdb")
        if i + 1 >= len(sys.argv):
            sys.exit("usage: tpme_single.py METHOD [--lmdb PATH]")
        return LmdbImageStore(sys.argv[i + 1]), "lmdb"
    return SyntheticImageStore(224), "synthetic"


def measure_uncached(method: str):
    from iisan_tpu.config import IISANConfig
    from iisan_tpu.data.synthetic import synthetic_corpus
    from iisan_tpu.train.uncached import UncachedTrainer
    from iisan_tpu.utils.tpme import trainable_param_count

    # Reference method configs (scripts/run_{IISAN,fft,lora,adapter,bitfit}.py)
    # PEFT rows pass fine_tune_to='None' explicitly (as every shipped
    # reference script does) - with 'all' the reference trains the towers
    # too (run.py:177-178) and so would we.
    overrides = {
        "iisan_uncached": dict(adapter_type="IISAN", adding_adapter_to="all",
                               fine_tune_to="None"),
        "fft": dict(adapter_type="fft", adding_adapter_to="None",
                    fine_tune_to="all"),
        "lora": dict(adapter_type="lora", adding_adapter_to="all",
                     fine_tune_to="None",
                     bert_adapter_down_size=8, cv_adapter_down_size=8),
        "houlsby": dict(adapter_type="houslby", adding_adapter_to="all",
                        fine_tune_to="None",
                        bert_adapter_down_size=64, cv_adapter_down_size=64),
        "bitfit": dict(adapter_type="bitfit", adding_adapter_to="all",
                       fine_tune_to="None"),
    }[method]
    # --users N: size of the host-fed e2e epoch (default 256 keeps the
    # six-method TPME sweep affordable through the tunnel; pass 12076 to
    # measure a full Scientific epoch with NO linear scaling).
    n_users = 256
    if "--users" in sys.argv:
        i = sys.argv.index("--users")
        if i + 1 >= len(sys.argv) or not sys.argv[i + 1].isdigit():
            sys.exit("usage: tpme_single.py METHOD [--remat] [--users N] "
                     "(--users needs a positive integer)")
        n_users = int(sys.argv[i + 1])
    corpus = synthetic_corpus(n_users=n_users, item_num=600, seed=0)
    rng = np.random.default_rng(0)
    tokens = np.zeros((corpus.item_num + 1, 60), np.int32)
    tokens[1:, :30] = rng.integers(1, 30000, size=(corpus.item_num, 30))
    tokens[1:, 30:] = 1

    # Tower-backward methods can exceed one v5e's 16 GB at the reference
    # batch size (the reference used a 47 GB A100 for FFT, README.md:35);
    # jax.checkpoint on the tower layers is the TPU-native fix.  The
    # OOM -> remat retry happens at the tpme_report.py level, in a FRESH
    # process: an OOM'd backend does not reliably release its buffers for
    # an in-process second attempt.
    remat = "--remat" in sys.argv
    cfg = IISANConfig(pipeline="uncached", batch_size=32, epoch=1,
                      embedding_dim=64, seed=12345,
                      side_adapter_vit_list="1,3,5,7,9,11",
                      side_adapter_bert_list="1,3,5,7,9,11",
                      remat_towers=remat, **overrides)
    store, store_kind = _image_store()
    tr = UncachedTrainer(cfg, corpus, tokens, store)
    b = tr.device_bench(n_steps=8)
    steps_per_epoch = -(-SCIENTIFIC_USERS // cfg.batch_size)

    # Host-fed epochs through run_epoch's real feed path, but with
    # SyntheticImageStore supplying in-memory RNG images - NO JPEG decode
    # or LMDB read happens, so this measures the feed machinery + device
    # work, not image-decode cost (VERDICT r1 weak #1 asked for a true
    # epoch; a real-decode feed would differ).  First epoch compiles the
    # per-batch step; the second is the timed one.
    import jax

    tr.run_epoch(0)
    jax.block_until_ready(tr.params)
    t0 = time.time()
    tr.run_epoch(1)
    jax.block_until_ready(tr.params)
    e2e_wall = time.time() - t0

    return {
        "label": method,
        "epoch_seconds": b["seconds_per_step"] * steps_per_epoch,
        "epoch_seconds_basis":
            f"device-bound jitted-scan step x {steps_per_epoch} steps "
            "(EXTRAPOLATED to the Scientific epoch; the consistent "
            "cross-method basis the TPME score uses)",
        "epoch_seconds_e2e": e2e_wall * (SCIENTIFIC_USERS / corpus.n_users),
        "epoch_seconds_e2e_basis":
            (f"MEASURED full host-fed Scientific epoch ({corpus.n_users} "
             f"users, {e2e_wall:.1f}s wall, UNSCALED)"
             if corpus.n_users == SCIENTIFIC_USERS else
             f"MEASURED host-fed run_epoch over {corpus.n_users} users "
             f"({e2e_wall:.1f}s wall) scaled linearly to "
             f"{SCIENTIFIC_USERS} users") +
            ("; images decoded from a reference-layout LMDB catalog "
             "(REAL host decode path: LMDB read -> pickle -> resize -> "
             "normalize; synthetic-content pixels, "
             "scripts/make_synth_lmdb.py)"
             if store_kind == "lmdb" else
             "; images from SyntheticImageStore "
             "(in-memory RNG pixels - no JPEG decode/LMDB read)") +
            ", host feed tunnel/1-core-limited in this environment "
            "(docs/ROUND2_NOTES.md)",
        "e2e_image_store": store_kind,
        "e2e_measured_users": corpus.n_users,
        "e2e_measured_seconds": e2e_wall,
        "trainable_params": trainable_param_count(tr),
        "memory_bytes": b["memory_bytes"],
        "batch_size": cfg.batch_size,
        "step_seconds": b["seconds_per_step"],
        "tflops_per_step": b["flops_per_step"] / 1e12,
        "remat_towers": remat,
    }


def main():
    from iisan_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    method = sys.argv[1]
    rec = measure_cached() if method == "iisan_cached" \
        else measure_uncached(method)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
