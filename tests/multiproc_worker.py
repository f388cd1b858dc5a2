"""Worker for the two-process jax.distributed integration test.

Each process: join the distributed runtime (CPU, 1 local device), build the
same synthetic corpus + CachedTrainer over the global 2-device mesh, run
one training epoch and a validation eval, print one JSON result line.
Run by tests/test_distributed.py::test_two_process_cached_training.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    rank = int(sys.argv[1])
    port = sys.argv[2]
    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(f"localhost:{port}", num_processes=2,
                               process_id=rank)

    from iisan_tpu.config import IISANConfig
    from iisan_tpu.data.synthetic import synthetic_corpus, synthetic_taps
    from iisan_tpu.train.cached import CachedTrainer

    cfg = IISANConfig(batch_size=8, epoch=1, embedding_dim=16,
                      side_adapter_vit_list="1,3", side_adapter_bert_list="1,3",
                      word_embedding_dim=32, image_embedding_dim=32,
                      compute_dtype="float32", eval_batch_size=8, seed=3)
    corpus = synthetic_corpus(n_users=64, item_num=120, seed=5)
    k = len(cfg.san_image_taps())
    tr = CachedTrainer(cfg, corpus,
                       synthetic_taps(120, k, 32, seed=1),
                       synthetic_taps(120, k, 32, seed=2))
    assert jax.process_count() == 2 and tr.mesh.devices.size == 2
    loss = tr.run_epoch(1)
    hit, ndcg = tr.evaluate_split("valid")

    # Uncached: per-host image decode must cover only this host's shard.
    import numpy as np

    from iisan_tpu.data.images import SyntheticImageStore
    from iisan_tpu.train.uncached import UncachedTrainer

    class CountingStore(SyntheticImageStore):
        def __init__(self, resize):
            super().__init__(resize)
            self.calls = 0

        def get(self, name):
            self.calls += 1
            return super().get(name)

    ucfg = cfg.replace(pipeline="uncached", adapter_type="IISAN",
                       adding_adapter_to="all", fine_tune_to="None",
                       CV_resize=32,
                       num_words_title=4, text_layers=2, image_layers=2,
                       side_adapter_vit_list="1", side_adapter_bert_list="1")
    rng = np.random.default_rng(0)
    tokens = np.zeros((corpus.item_num + 1, 8), np.int32)
    tokens[1:, :4] = rng.integers(1, 100, size=(corpus.item_num, 4))
    tokens[1:, 4:] = 1
    store = CountingStore(32)
    utr = UncachedTrainer(ucfg, corpus, tokens, store)
    uloss = utr.run_epoch(1)
    # 64 users -> 8 batches x 8 users x 11 items = 704 rows; each host
    # decodes only non-pad rows of its half.
    decode_frac = store.calls / 704.0
    print(json.dumps({"rank": rank, "loss": loss, "hit": hit, "ndcg": ndcg,
                      "uloss": uloss, "decode_frac": decode_frac}),
          flush=True)


if __name__ == "__main__":
    main()
