"""IISAN (Cached) training pipeline.

TPU rebuild of /root/reference/Code_Cached/run.py:38-421.  Design deltas
from the reference, all in the TPU direction:

  * The per-item ``.pt`` hidden-state files re-read by DataLoader workers
    every step (dataset.py:81-86) become two device-resident tap tables
    ``[item_num+1, K, dim]``; a training batch is an on-device gather.
  * The epoch's DataLoader loop (run.py:368-393) becomes one jitted
    ``lax.scan`` over shuffled user indices - zero host<->device traffic
    per step, zero dispatch overhead, donated buffers.
  * AMP autocast + GradScaler (run.py:356,380-385) become bf16 activations
    with fp32 params/optimizer - no loss scaling needed on TPU.
  * DistributedSampler padding (dataset.py:342-348) is reproduced by
    wrapping the permutation to a whole number of batches.
  * Per-epoch validation with early-stop patience 10 and test-on-new-best
    mirror run.py:395-407,437-462.
"""

from __future__ import annotations

import functools
import logging
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import IISANConfig
from ..data.preprocess import Corpus
from ..eval.evaluate import compute_item_tables, evaluate
from ..models.model import rec_model_from_config
from ..parallel.mesh import make_mesh
from .loop import TrainLoopMixin
from .optim import build_optimizer, log_group_sizes

log = logging.getLogger("iisan_tpu")


class CachedTrainer(TrainLoopMixin):
    """End-to-end cached-mode training (the reference's headline config)."""

    def __init__(
        self,
        cfg: IISANConfig,
        corpus: Corpus,
        cv_taps: np.ndarray,    # (item_num+1, K_cv, image_dim)
        text_taps: np.ndarray,  # (item_num+1, K_text, text_dim)
        mesh=None,
    ):
        self.cfg = cfg
        self.corpus = corpus
        self.mesh = mesh or make_mesh(cfg.mesh_shape)
        self.model = rec_model_from_config(cfg)

        # The epoch/eval scans gather taps with mode="clip" (no out-of-
        # bounds fill), which silently reads the nearest row on a bad id.
        # The dense-id invariant comes from preprocessing; enforce it once
        # on the host so a corrupt/stale cache or seq file fails loudly
        # instead of training/evaluating on wrong features (ADVICE r1).
        # Validate against the full catalog (item_num + 1 rows incl. pad
        # row 0), not just train_seqs.max(): leave-one-out valid/test
        # targets can reference items that never appear in any train
        # sequence.
        need = corpus.item_num + 1
        for name, table in (("cv", cv_taps), ("text", text_taps)):
            if table.shape[0] < need:
                raise ValueError(
                    f"{name} tap table has {table.shape[0]} rows but the "
                    f"behaviors file references {corpus.item_num} items "
                    f"(need {need} rows incl. the pad row); cache and "
                    "behaviors files are out of sync")

        # Data-parallel layout over the mesh (DDP analog, run.py:258):
        # params replicated, per-step batch sharded on its batch dim via the
        # permutation's second axis; XLA inserts the grad psum.  When the
        # mesh carries a ``model`` axis, the big tap tables are additionally
        # tensor-sharded along the feature dim - the scaling path for
        # IISAN-Versa's 8192-dim caches (SURVEY.md section 5); the cascade's
        # down-projection contraction then reduces over the axis via an XLA
        # psum on ICI.
        from jax.sharding import NamedSharding, PartitionSpec as P

        self._repl = NamedSharding(self.mesh, P())
        axes = self.mesh.axis_names
        # meshes without a data axis (e.g. mesh_shape="model:8", pure
        # tensor sharding) replicate the per-step batch
        self._perm_sh = NamedSharding(
            self.mesh, P(None, "data") if "data" in axes else P())
        table_spec = P(None, None, "model") if "model" in axes else P()
        self._table_sh = NamedSharding(self.mesh, table_spec)
        # Multi-process meshes need global arrays built from host data (each
        # process holds identical host values - same seed, same files); a
        # single-process mesh takes the cheaper device_put.
        self._multiproc = jax.process_count() > 1

        # Device residency: tap tables + the full (tiny) index arrays.
        # cache_quant="int8" stores each table as int8 rows + per-(item,
        # tap) fp32 scales (ops/quant.py): half the HBM and half the
        # per-step gather bandwidth of bf16 — the scaling lever for
        # Versa's 8192-dim caches.  The scales (3 orders of magnitude
        # smaller) are replicated; the int8 rows take the table sharding.
        store_dt = jnp.dtype(cfg.compute_dtype)
        self.cv_table = self._put_table(cv_taps, store_dt)
        self.text_table = self._put_table(text_taps, store_dt)
        self.pop_prob = self._put(corpus.pop_prob, self._repl)
        self.train_seqs = self._put(corpus.train_seqs, self._repl)
        self.train_log_mask = self._put(corpus.train_log_mask, self._repl)

        rng = jax.random.PRNGKey(cfg.seed)
        rng, init_rng = jax.random.split(rng)
        self.rng = self._put(np.asarray(rng), self._repl)
        L = cfg.max_seq_len
        k_cv, k_text = cv_taps.shape[1], text_taps.shape[1]
        dummy_ids = jnp.zeros((2, L + 1), jnp.int32)
        variables = self.model.init(
            {"params": init_rng, "dropout": init_rng},
            dummy_ids,
            jnp.zeros((2 * (L + 1), k_cv, cv_taps.shape[2]), store_dt),
            jnp.zeros((2 * (L + 1), k_text, text_taps.shape[2]), store_dt),
            jnp.zeros((2, L), jnp.float32),
            self.pop_prob,
            deterministic=True,
        )
        self.params = jax.tree_util.tree_map(
            lambda x: self._put(x, self._repl), variables["params"])
        self.tx = build_optimizer(cfg, self.params)
        log_group_sizes(cfg, self.params)
        self.opt_state = jax.tree_util.tree_map(
            lambda x: self._put(x, self._repl), self.tx.init(self.params))
        self._epoch_fn = self._build_epoch_fn()
        # Fused epoch+eval state is built lazily on the first
        # run_epoch_with_eval call: callers that only run_epoch (TPME,
        # benchmarks, the Versa script) should not pay the valid-split
        # device staging or the extra program.
        self._epoch_eval_fn = None
        self._valid_eval_batches = None

        n_params = sum(x.size for x in jax.tree_util.tree_leaves(self.params))
        log.info("##### trainable_num %d #####", n_params)
        # Initial learned-gate dump (Code_Cached_Asym/run.py:255-270 parity).
        if cfg.pipeline == "cached_asym":
            for name, vals in self.gate_values().items():
                log.info("%s: %s", name, np.round(vals, 4).tolist())

    # ------------------------------------------------------------------
    def _put_table(self, taps, store_dt):
        """Host tap table -> device residency per cfg.cache_quant.

        ``taps`` may already be QuantTaps (an int8 on-disk store's
        load_taps output) - used as-is, dequantizing to the configured
        compute dtype, whatever cache_quant says (the disk values are
        already quantized; re-densifying would spend 4x host RAM for no
        precision)."""
        from ..ops.quant import QuantTaps, quantize_taps

        quant = getattr(self.cfg, "cache_quant", "none")
        if quant not in ("none", "int8"):
            raise ValueError(f"unsupported cache_quant={quant!r} "
                             "(expected 'none' or 'int8')")
        if isinstance(taps, QuantTaps):
            t = taps
        elif quant == "int8":
            t = quantize_taps(taps)
        else:
            return self._put(np.asarray(taps).astype(store_dt),
                             self._table_sh)
        return QuantTaps(self._put(t.q, self._table_sh),
                         self._put(t.scale, self._repl),
                         out_dtype=store_dt.name)

    # ------------------------------------------------------------------
    def _put(self, x, sharding):
        """Host value -> device array on the mesh; multi-process-safe."""
        if self._multiproc:
            from ..parallel.distributed import make_global

            return make_global(np.asarray(x), sharding)
        return jax.device_put(x, sharding)

    # ------------------------------------------------------------------
    def _make_scan_core(self):
        """Unjitted epoch body shared by _build_epoch_fn (train-only
        dispatch) and _build_epoch_eval_fn (fused train+eval dispatch)."""
        model, tx = self.model, self.tx

        def loss_fn(params, cv, text, ids, mask, pop_prob, rng):
            return model.apply(
                {"params": params}, ids, cv, text, mask, pop_prob,
                deterministic=False, rngs={"dropout": rng})

        # Tables/corpus arrays are explicit jit arguments (not closure
        # constants) so they are NOT baked into the compiled program -
        # important when the tap tables are hundreds of MB.
        # The hidden-state gathers use mode="clip": item ids are dense in
        # [0, item_num] by construction (preprocess.py re-densification), so
        # XLA's default out-of-bounds fill (a compare + select over the full
        # 2x(704,K,768) gather output, ~8 us/step on v5e) is pure waste.
        # gather_rows dequantizes on the fly when the table is QuantTaps.
        from ..ops.quant import gather_rows

        def step(tables, carry, batch):
            cv_table, text_table, pop_prob = tables
            ids, mask = batch
            params, opt_state, rng, loss_sum = carry
            rng, dropout_rng = jax.random.split(rng)
            flat = ids.reshape(-1)
            cv = gather_rows(cv_table, flat)
            text = gather_rows(text_table, flat)
            loss, grads = jax.value_and_grad(loss_fn)(
                params, cv, text, ids, mask, pop_prob, dropout_rng)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
            return (params, opt_state, rng, loss_sum + loss), loss

        unroll = max(self.cfg.epoch_scan_unroll, 1)

        def scan_core(params, opt_state, rng, perm, tables):
            # perm: (steps, batch) shuffled user indices.  The per-step
            # (batch, L+1) id / (batch, L) mask gathers are hoisted out of
            # the scan into one whole-epoch gather (~1 MB resident): inside
            # the scan each tiny gather still costs ~10 us of fixed op
            # latency on TPU; as scan xs they cost two ops per *epoch*.
            cv_table, text_table, seqs, log_mask, pop_prob = tables
            ids_all = jnp.take(seqs, perm, axis=0, mode="clip")
            mask_all = jnp.take(log_mask, perm, axis=0, mode="clip")
            (params, opt_state, rng, loss_sum), losses = jax.lax.scan(
                functools.partial(step, (cv_table, text_table, pop_prob)),
                (params, opt_state, rng, jnp.float32(0.0)),
                (ids_all, mask_all),
                unroll=unroll)
            return params, opt_state, rng, loss_sum / perm.shape[0], losses

        return scan_core

    def _build_epoch_fn(self):
        return jax.jit(self._make_scan_core(), donate_argnums=(0, 1))

    # ------------------------------------------------------------------
    def _prep_eval_batches(self, split: str):
        """Stacked (S, B, ...) eval arrays, device-resident once — the
        padding/reshape/sharding logic IS eval/evaluate.py's (shared
        helper), so the fused dispatch cannot drift from evaluate()."""
        from ..eval.evaluate import eval_sharding, stack_eval_batches

        c = self.corpus
        if split == "valid":
            arrays = (c.valid_tokens, c.valid_log_mask, c.valid_target,
                      c.valid_history)
        else:
            arrays = (c.test_tokens, c.test_log_mask, c.test_target,
                      c.test_history)
        bs = self.cfg.eval_batch_size
        prepped, n = stack_eval_batches(arrays, bs,
                                        eval_sharding(self.mesh, bs),
                                        place=self._put)
        return prepped + (n,)

    def _build_epoch_eval_fn(self):
        """ONE dispatch per epoch: train scan + item tables + eval scan.

        The reference runs train, get_MM_item_embeddings and eval_model as
        separate phases (run.py:368-405); computationally they chain with
        no host decision in between, so fusing them saves two dispatch
        round-trips per epoch (~30 ms each over this tunnel) and lets XLA
        overlap the table build with the tail of the epoch scan.
        Numerics are identical to run_epoch + evaluate_split: the table
        build and eval scan ARE evaluate.py's implementations, traced into
        this one program.
        """
        from ..eval.evaluate import _eval_scan_impl, fused_table_in_graph

        model = self.model
        scan_epoch = self._make_scan_core()

        @functools.partial(jax.jit, donate_argnums=(0, 1),
                           static_argnums=(5,))
        def epoch_eval_fn(params, opt_state, rng, perm, tables, n_users,
                          eval_batches):
            cv_table, text_table, seqs, log_mask, pop_prob = tables
            params, opt_state, rng, mean_loss, losses = scan_epoch(
                params, opt_state, rng, perm, tables)
            fused_table = fused_table_in_graph(model, params, cv_table,
                                               text_table)
            out = _eval_scan_impl(model, params, fused_table, *eval_batches)
            metrics = out.reshape(-1, 2)[:n_users]
            hit, ndcg = jnp.mean(metrics, axis=0)
            return (params, opt_state, rng, mean_loss, losses, hit, ndcg,
                    fused_table)

        return epoch_eval_fn

    def run_epoch_with_eval(self, epoch: int):
        """Fused epoch + valid eval in one dispatch; returns
        (loss, hit, ndcg).  Falls back to None when disabled."""
        if not getattr(self.cfg, "fused_epoch_eval", True):
            return None
        if self._epoch_eval_fn is None:
            self._valid_eval_batches = self._prep_eval_batches("valid")
            self._epoch_eval_fn = self._build_epoch_eval_fn()
        perm = self._put(self.epoch_permutation(epoch), self._perm_sh)
        tables = (self.cv_table, self.text_table, self.train_seqs,
                  self.train_log_mask, self.pop_prob)
        *ev, n_users = self._valid_eval_batches
        (self.params, self.opt_state, self.rng, mean_loss, losses, hit,
         ndcg, fused_table) = self._epoch_eval_fn(
            self.params, self.opt_state, self.rng, perm, tables, n_users,
            tuple(ev))
        self._last_step_losses = losses
        # the dispatch already built the fused item table for THESE params;
        # a test eval on a new-best epoch reuses it instead of a second
        # full-catalog SAN pass (identity-keyed: any param update evicts)
        self._fused_table_cache = (self.params, fused_table)
        return float(mean_loss), float(hit), float(ndcg)

    # ------------------------------------------------------------------
    def epoch_permutation(self, epoch: int) -> np.ndarray:
        """Shuffled user indices wrapped to whole batches.

        sampler.set_epoch(seed+epoch) analog (run.py:367) with the
        SequentialDistributedSampler-style wrap padding (dataset.py:342-348).
        """
        n = self.corpus.n_users
        bs = self.cfg.batch_size
        rng = np.random.default_rng(self.cfg.seed + epoch)
        perm = rng.permutation(n)
        n_pad = ((n + bs - 1) // bs) * bs
        perm = np.resize(perm, n_pad)  # cyclic wrap, handles bs > n_users
        return perm.reshape(-1, bs).astype(np.int32)

    def run_epoch(self, epoch: int) -> float:
        # Same seeded permutation on every process; sharding over the
        # mesh's data axis IS the per-host slicing (DistributedSampler +
        # set_epoch analog, run.py:146,395).
        perm = self._put(self.epoch_permutation(epoch), self._perm_sh)
        tables = (self.cv_table, self.text_table, self.train_seqs,
                  self.train_log_mask, self.pop_prob)
        self.params, self.opt_state, self.rng, mean_loss, losses = \
            self._epoch_fn(self.params, self.opt_state, self.rng, perm, tables)
        self._last_step_losses = losses  # device array; fetched lazily
        return float(mean_loss)

    # ------------------------------------------------------------------
    def _build_multi_epoch_fn(self):
        """lax.scan over whole epochs: N epochs of training in ONE device
        dispatch.  Each epoch's body is exactly _make_scan_core, so the
        math (per-epoch permutation gather, RNG threading, optimizer
        updates) is identical to N sequential run_epoch calls - only the
        per-epoch host round-trip (~30 ms over a tunneled chip) and its
        dispatch overhead disappear.  Epoch shuffles stay host-seeded:
        they arrive stacked as a (E, steps, batch) argument."""
        scan_core = self._make_scan_core()

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def multi_fn(params, opt_state, rng, perms, tables):
            def body(carry, perm):
                params, opt_state, rng = carry
                params, opt_state, rng, mean_loss, _ = scan_core(
                    params, opt_state, rng, perm, tables)
                return (params, opt_state, rng), mean_loss

            (params, opt_state, rng), losses = jax.lax.scan(
                body, (params, opt_state, rng), perms)
            return params, opt_state, rng, losses

        return multi_fn

    def run_epochs(self, start_epoch: int, n_epochs: int) -> list:
        """Train ``n_epochs`` consecutive epochs in one dispatch; returns
        their mean losses.  Bit-compatible with sequential run_epoch
        calls (same permutations, same RNG threading)."""
        if not hasattr(self, "_multi_epoch_fn"):
            self._multi_epoch_fn = self._build_multi_epoch_fn()
        from jax.sharding import NamedSharding, PartitionSpec as P

        perms = np.stack([self.epoch_permutation(e)
                          for e in range(start_epoch, start_epoch + n_epochs)])
        spec = self._perm_sh.spec
        perms = self._put(perms, NamedSharding(self.mesh, P(None, *spec)))
        tables = (self.cv_table, self.text_table, self.train_seqs,
                  self.train_log_mask, self.pop_prob)
        self.params, self.opt_state, self.rng, losses = self._multi_epoch_fn(
            self.params, self.opt_state, self.rng, perms, tables)
        # the multi-epoch scan keeps only per-epoch means: clear the
        # per-step buffer so _log_step_losses cannot replay a stale epoch
        self._last_step_losses = None
        return [float(x) for x in np.asarray(losses)]

    # ------------------------------------------------------------------
    def fused_item_table(self):
        cached = getattr(self, "_fused_table_cache", None)
        if cached is not None and cached[0] is self.params:
            return cached[1]
        return compute_item_tables(
            self.model, self.params, self.cv_table, self.text_table)

    def evaluate_split(self, split: str = "valid") -> Tuple[float, float]:
        c = self.corpus
        table = self.fused_item_table()
        if split == "valid":
            args = (c.valid_tokens, c.valid_log_mask, c.valid_target, c.valid_history)
        else:
            args = (c.test_tokens, c.test_log_mask, c.test_target, c.test_history)
        return evaluate(self.model, self.params, table, *args,
                        batch_size=self.cfg.eval_batch_size, mesh=self.mesh)

    def gate_values(self) -> Dict[str, np.ndarray]:
        """Learned gate introspection (Code_Cached_Asym/run.py:255-270)."""
        out = {}
        san = self.params.get("san", {})
        for name in ("side_gate_params_text", "side_gate_params_cv",
                     "side_gate_params_mm"):
            if name in san:
                out[name] = np.asarray(jax.nn.sigmoid(san[name] / 0.1))
        return out
