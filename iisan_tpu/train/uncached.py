"""IISAN (Uncached) / baseline-PEFT training pipeline.

TPU rebuild of /root/reference/Code_Uncached/run.py:43-537: the frozen
BERT/ViT towers run inside the jitted train step every batch; adapter
method selection (IISAN / FFT / LoRA / Houlsby / BitFit) is a model +
trainability-mask choice instead of module monkey-patching.

Host pipeline: image decode happens on a thread pool with double-buffered
prefetch (data/images.py), replacing torch DataLoader workers
(run.py:134-135); tokens and ids are cheap numpy gathers.  The device step
is a single jit covering both towers, the SAN and the loss, bf16
activations (AMP analog, run.py:380-385).
"""

from __future__ import annotations

import functools
import logging
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import IISANConfig
from ..data.images import ParallelImageLoader
from ..data.preprocess import Corpus
from ..models.san import san_from_config
from ..models.towers import (FFTRecModel, UncachedIISANModel,
                             towers_from_config)
from .loop import TrainLoopMixin
from .optim import build_optimizer, log_group_sizes
from .peft_masks import trainable_mask

log = logging.getLogger("iisan_tpu")


def build_uncached_model(cfg: IISANConfig):
    """Adapter-method registry replacing run.py:186-260's injection code."""
    dtype = jnp.dtype(cfg.compute_dtype)
    text_tower, image_tower = towers_from_config(cfg, dtype)
    method = cfg.adapter_type if cfg.adding_adapter_to != "None" else "fft"
    if cfg.is_iisan():
        first = 1 if cfg.remove_first_bool else 0
        model = UncachedIISANModel(
            text_tower=text_tower,
            image_tower=image_tower,
            san=san_from_config(cfg),
            embedding_dim=cfg.embedding_dim,
            max_seq_len=cfg.max_seq_len,
            num_attention_heads=cfg.num_attention_heads,
            transformer_block=cfg.transformer_block,
            drop_rate=cfg.drop_rate,
            text_tap_ids=cfg.san_text_taps(),
            image_tap_ids=cfg.san_image_taps(),
            modality=cfg.modality,
            freeze_towers=cfg.towers_frozen(),
            dtype=dtype,
            fused_user_encoder=None
            if getattr(cfg, "fused_user_encoder", True) else False,
        )
        return model, "iisan"
    model = FFTRecModel(
        text_tower=text_tower,
        image_tower=image_tower,
        embedding_dim=cfg.embedding_dim,
        max_seq_len=cfg.max_seq_len,
        num_attention_heads=cfg.num_attention_heads,
        transformer_block=cfg.transformer_block,
        drop_rate=cfg.drop_rate,
        dtype=dtype,
        fused_user_encoder=None
        if getattr(cfg, "fused_user_encoder", True) else False,
    )
    return model, method


class UncachedTrainer(TrainLoopMixin):
    """End-to-end uncached training with towers in-graph."""

    def __init__(self, cfg: IISANConfig, corpus: Corpus,
                 token_table: np.ndarray, image_store,
                 tower_params: Optional[Dict] = None, mesh=None):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.distributed import put_global
        from ..parallel.mesh import make_mesh

        self.cfg = cfg
        self.corpus = corpus
        self.token_table = token_table  # (item_num+1, 2*num_words) int32
        self.image_store = image_store
        self.loader = ParallelImageLoader(
            image_store, num_threads=max(cfg.num_workers, 1))
        self.model, self.method = build_uncached_model(cfg)

        # Data-parallel layout (DDP analog, run.py:287): params replicated,
        # per-batch arrays sharded on their leading (user / item) axis over
        # the mesh's data axis; XLA inserts the grad psum.  Falls back to
        # replication when the batch does not divide the axis.
        self.mesh = mesh or make_mesh(cfg.mesh_shape)
        n_data = self.mesh.shape.get("data", 1)
        self._repl = NamedSharding(self.mesh, P())
        # meshes without a data axis (e.g. mesh_shape="model:8", pure
        # tensor sharding) replicate the batch
        row = (P("data") if "data" in self.mesh.axis_names
               and cfg.batch_size % n_data == 0 else P())
        self._row_sh = NamedSharding(self.mesh, row)
        self._put = put_global
        self.pop_prob = put_global(corpus.pop_prob, self._repl)

        rng = jax.random.PRNGKey(cfg.seed)
        self.rng, init_rng = jax.random.split(rng)
        L = cfg.max_seq_len
        n = 2 * (L + 1)
        dummy = (
            jnp.zeros((2, L + 1), jnp.int32),
            jnp.zeros((n, cfg.CV_resize, cfg.CV_resize, 3), jnp.float32),
            jnp.zeros((n, cfg.packed_text_width()
                       if hasattr(cfg, "packed_text_width")
                       else 2 * cfg.num_words_title), jnp.int32),
            jnp.zeros((2, L), jnp.float32),
        )
        variables = self.model.init(
            {"params": init_rng, "dropout": init_rng}, *dummy, self.pop_prob,
            deterministic=True)
        self.params = variables["params"]
        if tower_params:
            if getattr(cfg, "tower_quant", "none") != "none":
                tower_params = _quantize_grafted("", tower_params)
            self.params = _graft_tower_params(self.params, tower_params)
        self.mask = trainable_mask(
            self.params, self.method,
            finetune_layernorm="None" not in cfg.finetune_layernorm,
            freeze_paras_before=cfg.freeze_paras_before,
            fine_tune_to_all="all" in cfg.fine_tune_to)
        self.tx = build_optimizer(cfg, self.params, trainable_mask=self.mask)
        log_group_sizes(cfg, self.params, self.mask)
        self.params = jax.tree_util.tree_map(
            lambda x: self._put(x, self._repl), self.params)
        self.opt_state = jax.tree_util.tree_map(
            lambda x: self._put(x, self._repl), self.tx.init(self.params))
        self.rng = self._put(np.asarray(self.rng), self._repl)
        self._step = self._build_step()
        n_train = sum(
            x.size
            for x, m in zip(jax.tree_util.tree_leaves(self.params),
                            jax.tree_util.tree_leaves(self.mask)) if m)
        log.info("##### method %s trainable_num %d #####", self.method, n_train)

    def _make_step_body(self):
        """The single train-step body — jitted directly for training and
        wrapped in a scan by device_bench, so the benchmark can never
        measure a different program than training runs."""
        from ..data.images import normalize_images

        model, tx = self.model, self.tx
        dtype = jnp.dtype(self.cfg.compute_dtype)

        def loss_fn(params, ids, images, tokens, mask, pop, rng):
            return model.apply({"params": params}, ids, images, tokens, mask,
                               pop, deterministic=False,
                               rngs={"dropout": rng})

        def step(params, opt_state, rng, ids, images_u8, tokens, mask, pop):
            # uint8 crosses the host->device boundary; normalize on device
            images = normalize_images(images_u8, dtype)
            rng, dropout_rng = jax.random.split(rng)
            # allow_int: tower_quant='int8' puts int8 weight leaves in the
            # tree; they are frozen (stop_gradient at the taps), so their
            # grads are symbolic float0 zeros that never reach the Adam
            loss, grads = jax.value_and_grad(loss_fn, allow_int=True)(
                params, ids, images, tokens, mask, pop, dropout_rng)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = jax.tree_util.tree_map(
                lambda p, u: p if u.dtype == jax.dtypes.float0 else p + u,
                params, updates)
            return params, opt_state, rng, loss

        return step

    def _build_step(self):
        # donate params/opt_state: without donation XLA holds input AND
        # output copies of ~2.4 GB (fp32 params + Adam m/v at BERT-base +
        # ViT-base geometry) across every step
        return jax.jit(self._make_step_body(), donate_argnums=(0, 1))

    # ------------------------------------------------------------------
    def device_bench(self, n_steps: int = 10):
        """Device-bound throughput: n_steps train steps inside ONE jitted
        lax.scan on pre-staged data, blocked on completion, with XLA's own
        FLOP count.  Returns a dict with seconds_per_step, flops_per_step,
        users_per_sec and the executable's memory footprint.

        This is the honest measurement the extrapolated '31 ms/batch'
        number (round 1) was not: the scan leaves no async-dispatch gap to
        mis-time, and the FLOPs come from the compiled executable rather
        than hand math.
        """
        import time

        cfg, c = self.cfg, self.corpus
        bs, L = cfg.batch_size, cfg.max_seq_len
        # cyclically extend when the corpus is smaller than one batch
        # (same as epoch_permutation): a raw [:bs] slice would feed
        # mismatched batch dims into the jitted step
        seqs = np.resize(c.train_seqs, (bs, L + 1))
        log_mask = np.resize(c.train_log_mask, (bs, L))
        ids = self._put(seqs, self._row_sh)
        mask = self._put(log_mask, self._row_sh)
        flat = seqs.reshape(-1)
        tokens = self._put(self.token_table[flat], self._row_sh)
        rng_np = np.random.default_rng(0)
        images_u8 = self._put(rng_np.integers(
            0, 256, (bs * (L + 1), cfg.CV_resize, cfg.CV_resize, 3), np.uint8),
            self._row_sh)
        pop = self.pop_prob
        step_body = self._make_step_body()

        def body(carry, _):
            params, opt_state, rng = carry
            # OPAQUE per-iteration taint (runtime 0, unknowable at compile
            # time): real training feeds fresh images/tokens every step,
            # but this scan re-feeds one staged batch - and with the
            # frozen towers' params loop-invariant (masked Adam) and ViT
            # dropout 0.0, XLA legally HOISTS the entire ViT forward out
            # of the scan, reporting a ~4x throughput no real epoch can
            # reach (measured: 35 vs 136 ms/step at bs 32).  Tainting the
            # data inputs with an rng-derived opaque zero keeps them
            # iteration-dependent; `x.sum()*0`-style taints get folded
            # away by XLA's algebraic simplifier, a where() on a runtime
            # comparison does not.
            opaque = jnp.where(rng.sum() == np.uint32(0xDEADBEEF), 1, 0)
            params, opt_state, rng, loss = step_body(
                params, opt_state, rng, ids,
                images_u8 + opaque.astype(images_u8.dtype),
                tokens + opaque.astype(tokens.dtype), mask, pop)
            return (params, opt_state, rng), loss

        @jax.jit
        def run(params, opt_state, rng):
            (params, opt_state, rng), losses = jax.lax.scan(
                body, (params, opt_state, rng), None, length=n_steps)
            return params, opt_state, rng, losses

        compiled = run.lower(self.params, self.opt_state, self.rng).compile()
        # XLA's cost analysis counts a scan (while-loop) body ONCE, not
        # multiplied by trip count (verified empirically) - so the program
        # flops ARE the per-step flops.
        flops_per_step = float(
            (compiled.cost_analysis() or {}).get("flops", 0.0))
        # Axon-tunnel timing rules (established empirically, round 3):
        # block_until_ready can return before remote completion - only
        # FETCHING an output value bounds the computation - and repeated
        # executions must not present identical (executable, inputs)
        # requests, so each call gets a distinct folded rng.  The one
        # dispatch+fetch round trip (~27 ms) is <2% of any n_steps>=10
        # run at these step times.
        out = compiled(self.params, self.opt_state,
                       jax.random.fold_in(self.rng, 1))  # warm-up
        np.asarray(out[3])
        t0 = time.time()
        out = compiled(self.params, self.opt_state,
                       jax.random.fold_in(self.rng, 2))
        np.asarray(out[3])  # fetch per-step losses: the completion bound
        dt = time.time() - t0
        sec_per_step = dt / n_steps
        from ..utils.tpme import compiled_memory_bytes

        return {
            "seconds_per_step": sec_per_step,
            "flops_per_step": flops_per_step,
            "users_per_sec": bs / sec_per_step,
            "memory_bytes": compiled_memory_bytes(compiled),
        }

    # ------------------------------------------------------------------
    def _batch_names(self, ids_flat: np.ndarray):
        """Pad id 0 -> None: the loader feeds a zero image with no store
        lookup (reference pads with zero tensors, dataset.py:66-70)."""
        names = self.corpus.item_names
        return [names[i] if i > 0 else None for i in ids_flat]

    def _owned_image_iter(self, flat_batches, shape):
        """Decode only the rows whose shards live on this process (the
        work-partitioning half of DistributedSampler, run.py:146), zero-fill
        the rest of the host buffer (never uploaded - make_global reads only
        addressable index slices)."""
        from ..parallel.distributed import owned_rows

        owned = owned_rows(self._row_sh, shape)
        name_batches = [self._batch_names(fb[owned]) for fb in flat_batches]
        full = len(owned) == shape[0]
        for imgs in self.loader.iter_batches(name_batches):
            if full:
                yield imgs
            else:
                buf = np.zeros(shape, np.uint8)
                buf[owned] = imgs
                yield buf

    def run_epoch(self, epoch: int) -> float:
        cfg, c = self.cfg, self.corpus
        bs, L = cfg.batch_size, cfg.max_seq_len
        rng = np.random.default_rng(cfg.seed + epoch)
        perm = rng.permutation(c.n_users)
        n_pad = ((c.n_users + bs - 1) // bs) * bs
        perm = np.resize(perm, n_pad).reshape(-1, bs)

        batches = [c.train_seqs[p].reshape(-1) for p in perm]
        img_shape = (bs * (L + 1), cfg.CV_resize, cfg.CV_resize, 3)
        losses = []
        img_iter = self._owned_image_iter(batches, img_shape)
        for p, flat_ids, images in zip(perm, batches, img_iter):
            ids = self._put(c.train_seqs[p], self._row_sh)
            mask = self._put(c.train_log_mask[p], self._row_sh)
            tokens = self._put(self.token_table[flat_ids], self._row_sh)
            images = self._put(images, self._row_sh)
            self.params, self.opt_state, self.rng, loss = self._step(
                self.params, self.opt_state, self.rng, ids,
                images, tokens, mask, self.pop_prob)
            losses.append(loss)
        self._last_step_losses = jnp.stack(losses)  # CachedTrainer parity
        return float(jnp.mean(self._last_step_losses))

    # ------------------------------------------------------------------
    def item_embedding_tables(self, batch: int = 256):
        """Full-catalog pass (get_MM_item_embeddings analog,
        Code_Uncached/data_utils/metrics.py:69-107)."""
        c = self.corpus
        n = c.item_num + 1
        emb = _fused_item_emb
        outs = []
        idx = np.arange(n)
        name_batches = []
        for s in range(0, n, batch):
            e = min(s + batch, n)
            ids = np.resize(idx[s:e], batch)
            name_batches.append(self._batch_names(ids))
        img_iter = self.loader.iter_batches(name_batches)
        for s, images in zip(range(0, n, batch), img_iter):
            e = min(s + batch, n)
            ids = np.resize(idx[s:e], batch)
            # padding row 0: _batch_names maps id 0 to the loader's
            # zero image (gray after norm; the reference feeds literal
            # zeros post-norm, dataset.py:233 - the value difference only
            # touches the never-ranked pad column)
            images = np.asarray(images)
            tokens = self._put(self.token_table[ids], self._repl)
            outs.append(emb(self.model, self.params,
                            self._put(images, self._repl), tokens)[: e - s])
        return jnp.concatenate(outs, axis=0)

    def gate_values(self) -> Dict[str, np.ndarray]:
        """Learned gate introspection (Code_Cached_Asym/run.py:255-270)."""
        out = {}
        san = self.params.get("san", {})
        for name in ("side_gate_params_text", "side_gate_params_cv",
                     "side_gate_params_mm"):
            if name in san:
                out[name] = np.asarray(jax.nn.sigmoid(san[name] / 0.1))
        return out

    def evaluate_split(self, split: str = "valid",
                       batch_size: int = None) -> Tuple[float, float]:
        from ..eval.evaluate import evaluate

        if batch_size is None:
            batch_size = self.cfg.eval_batch_size

        c = self.corpus
        table = self.item_embedding_tables()
        if split == "valid":
            args = (c.valid_tokens, c.valid_log_mask, c.valid_target,
                    c.valid_history)
        else:
            args = (c.test_tokens, c.test_log_mask, c.test_target,
                    c.test_history)
        return evaluate(self.model, self.params, table, *args,
                        batch_size=batch_size, mesh=self.mesh)


@functools.partial(jax.jit, static_argnums=0)
def _fused_item_emb(model, params, images_u8, tokens):
    from ..data.images import normalize_images

    images = normalize_images(images_u8, model.dtype or jnp.float32)
    cv, text, mm = model.apply({"params": params}, images, tokens,
                               method=model.item_embeddings)
    return model.apply({"params": params}, cv, text, mm,
                       method=model.fuse_embeddings)


def _graft_tower_params(params, tower_params):
    """Overlay pretrained tower weights onto the init tree."""
    out = dict(params)
    for key, sub in tower_params.items():
        node = out
        parts = key.split("/")
        for p in parts[:-1]:
            node = node[p]
        node[parts[-1]] = sub
    return out


def _quantize_grafted(path, sub):
    """tower_quant='int8' graft conversion: float {kernel, bias} dense
    dicts inside the encoder subtrees ('bert' / 'vit' path components)
    become Int8Dense {kernel_q, kscale, bias}; the trainable heads
    (fc / classifier) and everything else stay float."""
    from ..ops.int8_linear import quantize_dense_tree

    parts = [p for p in path.split("/") if p]
    if "bert" in parts or "vit" in parts:
        return quantize_dense_tree(sub)
    if isinstance(sub, dict):
        return {k: _quantize_grafted(f"{path}/{k}", v)
                for k, v in sub.items()}
    return sub
