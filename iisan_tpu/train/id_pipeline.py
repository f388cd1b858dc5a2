"""ID-embedding baseline pipeline (item_tower='id').

The reference's non-modal path (/root/reference/Code_Cached/model/model.py:
35-36, Build_Id_Dataset, get_itemId_embeddings at
data_utils/metrics.py:115-126): item embeddings come from a learned table,
everything else (SASRec + in-batch CE + eval) is identical.  Like the
cached pipeline, the epoch is one jitted lax.scan.
"""

from __future__ import annotations

import functools
import logging
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import IISANConfig
from ..data.preprocess import Corpus
from ..eval.evaluate import evaluate
from ..models.model import IDRecModel
from .loop import TrainLoopMixin

log = logging.getLogger("iisan_tpu")


class IDTrainer(TrainLoopMixin):
    def __init__(self, cfg: IISANConfig, corpus: Corpus):
        self.cfg = cfg
        self.corpus = corpus
        self.model = IDRecModel(
            item_num=corpus.item_num,
            embedding_dim=cfg.embedding_dim,
            max_seq_len=cfg.max_seq_len,
            num_attention_heads=cfg.num_attention_heads,
            transformer_block=cfg.transformer_block,
            drop_rate=cfg.drop_rate,
            dtype=jnp.dtype(cfg.compute_dtype),
            fused_user_encoder=None if getattr(cfg, "fused_user_encoder", True)
            else False,
        )
        self.pop_prob = jax.device_put(corpus.pop_prob)
        self.train_seqs = jax.device_put(corpus.train_seqs)
        self.train_log_mask = jax.device_put(corpus.train_log_mask)
        rng = jax.random.PRNGKey(cfg.seed)
        self.rng, init_rng = jax.random.split(rng)
        L = cfg.max_seq_len
        self.params = self.model.init(
            {"params": init_rng, "dropout": init_rng},
            jnp.zeros((2, L + 1), jnp.int32), jnp.zeros((2, L)),
            self.pop_prob, deterministic=True)["params"]
        # Single-lr Adam (run.py:335: optim.Adam(parameters, lr=args.lr)).
        import optax

        self.tx = optax.adam(cfg.lr, b1=0.9, b2=0.999, eps=1e-8)
        self.opt_state = self.tx.init(self.params)
        self._epoch_fn = self._build_epoch_fn()

    def _build_epoch_fn(self):
        model, tx = self.model, self.tx

        def loss_fn(params, ids, mask, pop, rng):
            return model.apply({"params": params}, ids, mask, pop,
                               deterministic=False, rngs={"dropout": rng})

        def step(tables, carry, user_idx):
            seqs, log_mask, pop = tables
            params, opt_state, rng, loss_sum = carry
            rng, dr = jax.random.split(rng)
            ids = jnp.take(seqs, user_idx, axis=0)
            mask = jnp.take(log_mask, user_idx, axis=0)
            loss, grads = jax.value_and_grad(loss_fn)(params, ids, mask, pop, dr)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
            return (params, opt_state, rng, loss_sum + loss), loss

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def epoch_fn(params, opt_state, rng, perm, tables):
            (params, opt_state, rng, loss_sum), losses = jax.lax.scan(
                functools.partial(step, tables),
                (params, opt_state, rng, jnp.float32(0.0)), perm)
            return params, opt_state, rng, loss_sum / perm.shape[0], losses

        return epoch_fn

    def run_epoch(self, epoch: int) -> float:
        n, bs = self.corpus.n_users, self.cfg.batch_size
        rng = np.random.default_rng(self.cfg.seed + epoch)
        perm = np.resize(rng.permutation(n),
                         ((n + bs - 1) // bs) * bs).reshape(-1, bs)
        tables = (self.train_seqs, self.train_log_mask, self.pop_prob)
        (self.params, self.opt_state, self.rng, loss,
         losses) = self._epoch_fn(
            self.params, self.opt_state, self.rng, jnp.asarray(perm), tables)
        # per-step losses feed the mixin's intra-epoch 'cnt/Ed/batch loss'
        # lines (run.py:390-392 covers the ID branch too)
        self._last_step_losses = losses
        return float(loss)

    def evaluate_split(self, split: str = "valid") -> Tuple[float, float]:
        c = self.corpus
        table = self.params["id_embedding"]["embedding"]
        if split == "valid":
            args = (c.valid_tokens, c.valid_log_mask, c.valid_target,
                    c.valid_history)
        else:
            args = (c.test_tokens, c.test_log_mask, c.test_target,
                    c.test_history)
        return evaluate(self.model, self.params, table, *args,
                        batch_size=self.cfg.eval_batch_size)
