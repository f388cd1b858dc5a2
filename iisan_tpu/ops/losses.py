"""In-batch popularity-debiased sampled-softmax cross-entropy loss.

Vectorized XLA rebuild of ModelMM.forward's loss block
(/root/reference/Code_Cached/model/model.py:81-105).  The reference builds
its repeat-item rejection mask with an O(batch) Python loop of per-user
tensor ops (model.py:92-100); here the whole mask is one broadcast compare,
so the entire loss is a single fused (bs*L, bs*(L+1)) matmul + masking +
log-softmax - exactly the shape XLA tiles onto the MXU.

Semantics reproduced exactly:
  * scores = prec_vec @ score_embs.T over ALL bs*(L+1) in-batch items,
    including the row user's own column block (model.py:86);
  * minus log(pop_prob[item_id]) popularity debias (model.py:64,87);
  * columns whose extended log-mask (log_mask plus an appended ones column)
    is 0 are filled with -1e4 (model.py:88-89);
  * for row-user i, every column whose item id occurs anywhere in user i's
    padded id list is filled with -1e4, EXCEPT the true next-item target
    column i*(L+1)+j+1 which is re-allowed (model.py:92-100);
  * labels are ce_label[i,j] = i*max_seq_len + i + j = i*(L+1)+j for
    j in 1..L (model.py:83-85), i.e. the target column of each row; loss is
    the mean CE over rows where log_mask != 0 (model.py:102-104).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def inbatch_ce_loss(
    prec_vec: jnp.ndarray,      # (bs, L, D) user-encoder outputs
    score_embs: jnp.ndarray,    # (bs*(L+1), D) fused item embeddings
    item_ids: jnp.ndarray,      # (bs, L+1) int item ids (0 = pad)
    log_mask: jnp.ndarray,      # (bs, L) float {0,1}
    pop_prob: jnp.ndarray,      # (item_num+1,) popularity probabilities
) -> jnp.ndarray:
    bs, L, d = prec_vec.shape
    n = bs * (L + 1)

    flat_ids = item_ids.reshape(-1)                       # (N,)
    debias = jnp.log(pop_prob[flat_ids])                  # (N,)

    logits = jnp.dot(
        prec_vec.reshape(bs * L, d),
        score_embs.T,
        preferred_element_type=jnp.float32,
    )                                                     # (bs*L, N)
    logits = logits - debias[None, :].astype(jnp.float32)

    # Column padding mask: extended log-mask flattened (model.py:88-89).
    ext_mask = jnp.concatenate(
        [log_mask, jnp.ones((bs, 1), log_mask.dtype)], axis=1
    ).reshape(-1)                                         # (N,)
    col_pad = ext_mask == 0                               # (N,)

    # Repeat-item rejection (model.py:92-100): column c is rejected for user
    # i iff flat_ids[c] appears in item_ids[i], except the target column.
    member = jnp.any(
        flat_ids[None, None, :] == item_ids[:, :, None], axis=1
    )                                                     # (bs, N)
    col_idx = jnp.arange(n)[None, None, :]                # (1, 1, N)
    targets = (jnp.arange(bs) * (L + 1))[:, None] + jnp.arange(1, L + 1)[None, :]
    reject = member[:, None, :] & (col_idx != targets[:, :, None])  # (bs, L, N)

    masked = col_pad[None, None, :] | reject
    logits = jnp.where(masked.reshape(bs * L, n), -1e4, logits)

    # Cross entropy over valid rows only (model.py:102-104).
    labels = targets.reshape(-1)                          # (bs*L,)
    logz = jax.nn.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]
    ce = logz - gold                                      # (bs*L,)
    w = log_mask.reshape(-1).astype(jnp.float32)
    return jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1.0)


def sequence_train_loss(user_encoder, score_embs, item_ids, log_mask,
                        pop_prob, max_seq_len: int, embedding_dim: int,
                        deterministic: bool):
    """Shared model tail: (bs*(L+1), emb) item embeddings -> SASRec over
    positions [:, :-1] -> debiased in-batch CE in fp32
    (ModelMM.forward, model.py:61-105).  The single source of the
    reshape/slice/cast contract every rec model shares - keep the four
    models from drifting on it."""
    bs = log_mask.shape[0]
    input_embs = score_embs.reshape(bs, max_seq_len + 1, embedding_dim)
    prec_vec = user_encoder(input_embs[:, :-1, :], log_mask, deterministic)
    return inbatch_ce_loss(
        prec_vec.astype(jnp.float32),
        score_embs.astype(jnp.float32),
        item_ids,
        log_mask,
        pop_prob,
    )
