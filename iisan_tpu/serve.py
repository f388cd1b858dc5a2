"""Batch inference / serving: top-K recommendations from a trained model.

The reference has no serving path (evaluation doubles as its only
inference, SURVEY.md section 4); production deployment needs one.  The
``Recommender`` precomputes the fused item-embedding table once (the same
jitted SAN pass evaluation uses), then answers queries with a single
device dispatch: gather sequence rows -> user encoder -> full-catalog
scores -> mask history -> top-K.

    rec = Recommender.from_trainer(trainer)
    items, scores = rec.top_k(seq_ids, k=10)   # (B, k) item ids

Works with any trainer exposing the eval surface (cached / uncached / id).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .ops.metrics import mask_history


@functools.partial(jax.jit, static_argnums=(0, 6))
def _topk_step(model, params, fused_table, tokens, log_mask, history, k):
    input_embs = jnp.take(fused_table, tokens, axis=0)
    prec = model.apply({"params": params}, input_embs, log_mask,
                       method=model.user_scores)[:, -1, :]
    scores = jnp.dot(prec.astype(jnp.float32),
                     fused_table.T.astype(jnp.float32),
                     preferred_element_type=jnp.float32)
    scores = mask_history(scores, history)
    scores = scores.at[:, 0].set(-jnp.inf)  # never recommend the pad item
    top_scores, top_ids = jax.lax.top_k(scores, k)
    return top_ids, top_scores


class Recommender:
    """Frozen-table batch recommender."""

    def __init__(self, model, params, fused_table, max_seq_len: int):
        self.model = model
        self.params = params
        self.fused_table = fused_table
        self.max_seq_len = max_seq_len

    @classmethod
    def from_trainer(cls, trainer) -> "Recommender":
        if hasattr(trainer, "fused_item_table"):
            table = trainer.fused_item_table()
        elif hasattr(trainer, "item_embedding_tables"):
            table = trainer.item_embedding_tables()
        else:  # id pipeline
            table = trainer.params["id_embedding"]["embedding"]
        return cls(trainer.model, trainer.params, table,
                   trainer.cfg.max_seq_len)

    def _prep(self, seqs) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Ragged python sequences -> left-padded tokens/log_mask/history."""
        L = self.max_seq_len
        b = len(seqs)
        tokens = np.zeros((b, L), np.int32)
        log_mask = np.zeros((b, L), np.float32)
        hist_len = max(max((len(s) for s in seqs), default=1), 1)
        history = np.zeros((b, hist_len), np.int32)
        for i, s in enumerate(seqs):
            s = list(s)[-L:]
            tokens[i, L - len(s):] = s
            log_mask[i, L - len(s):] = 1.0
            full = list(seqs[i])
            history[i, :len(full)] = full
        return tokens, log_mask, history

    def top_k(self, seqs, k: int = 10,
              exclude_history: bool = True) -> Tuple[np.ndarray, np.ndarray]:
        """seqs: iterable of item-id sequences (most recent last).

        Returns (item_ids, scores), each (B, k); history items are excluded
        by default (the evaluation convention, metrics.py:238-240).
        """
        tokens, log_mask, history = self._prep(seqs)
        if not exclude_history:
            history = np.zeros_like(history)
        ids, scores = _topk_step(
            self.model, self.params, self.fused_table,
            jnp.asarray(tokens), jnp.asarray(log_mask),
            jnp.asarray(history), k)
        return np.asarray(ids), np.asarray(scores)
