"""Batched on-device HR@K / nDCG@K ranking metrics.

Rebuild of metrics_topK and the per-user eval loop
(/root/reference/Code_Cached/data_utils/metrics.py:59-67,194-245) as one
vectorized device computation: instead of sorting the full catalog per user
on the host, the rank of the single target item is
``1 + #(scores strictly greater than the target's score)`` - identical to
the reference's argsort position for distinct scores (torch.argsort tie
order is unspecified, so exact-tie behavior is noise in both systems) and
O(items) instead of O(items log items).
"""

from __future__ import annotations

import jax.numpy as jnp


def hit_ndcg_at_k(
    scores: jnp.ndarray,    # (B, item_num) catalog scores, pad col dropped
    target: jnp.ndarray,    # (B,) 0-based target index into the score row
    k: int = 10,
) -> jnp.ndarray:
    """Returns (B, 2): [hit@k, ndcg@k] per user (metrics.py:59-67).

    rank is 1-based; hit = rank <= k; ndcg = 1/log2(rank+1) when hit else 0.
    """
    tgt_score = jnp.take_along_axis(scores, target[:, None], axis=-1)  # (B,1)
    rank = 1 + jnp.sum((scores > tgt_score).astype(jnp.int32), axis=-1)
    hit = (rank <= k).astype(jnp.float32)
    ndcg = hit / jnp.log2(rank.astype(jnp.float32) + 1.0)
    return jnp.stack([hit, ndcg], axis=-1)


def mask_history(scores: jnp.ndarray, history: jnp.ndarray) -> jnp.ndarray:
    """Set scores at each user's historical item ids to -inf.

    ``history`` is (B, H) padded with 0; index 0 is the padding item whose
    column the caller drops afterwards (metrics.py:238-240), so masking it
    is harmless - exactly the reference's ``score[history] = -inf``.
    """
    b = scores.shape[0]
    rows = jnp.arange(b)[:, None]
    return scores.at[rows, history].set(-jnp.inf)
