"""Full-catalog ranking evaluation, entirely on device.

Rebuild of get_MM_item_embeddings + eval_model
(/root/reference/Code_Cached/data_utils/metrics.py:69-111,162-250).  The
reference streams the catalog through the SAN, copies tables to CPU, then
ranks user-by-user in a Python loop (metrics.py:207-245); here:

  1. one jitted chunked SAN pass produces the per-modality tables;
  2. ``com_dense`` fuses them once into a single (item_num+1, emb) table -
     equivalent to fusing per-sequence (a linear map commutes with the
     row-gather);
  3. a jitted batch step gathers sequence rows, runs the user encoder,
     scores the full catalog as one (B, items) matmul, scatter-masks each
     user's history to -inf, drops the padding column, and computes
     HR@10/nDCG@10 - no host round-trips, no per-user loop.

All jitted entry points take the (hashable) flax module as a static
argument so compilations are cached across epochs/evals.

Multi-chip: the batch axis is sharded over the ``data`` mesh axis; the mean
reduction is the all_gather/mean of eval_concat (metrics.py:50-56).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.metrics import hit_ndcg_at_k, mask_history
from ..ops.quant import gather_rows


def _fuse_chunk_impl(model, params, cv, text):
    """SAN + com_dense over one catalog chunk (shared by the host-chunked
    and in-graph table builders)."""
    emb_cv, emb_text, emb_mm = model.apply(
        {"params": params}, cv, text, method=model.item_embeddings)
    return model.apply(
        {"params": params}, emb_cv, emb_text, emb_mm,
        method=model.fuse_embeddings)


def _fuse_ids_impl(model, params, cv_taps, text_taps, ids):
    """Gather one id-chunk of catalog rows (dequantizing if the table is
    QuantTaps) and fuse it.  mode="clip": tail ids past the catalog read
    the last row; callers slice those rows off."""
    return _fuse_chunk_impl(model, params,
                            gather_rows(cv_taps, ids),
                            gather_rows(text_taps, ids))


_emb_chunk = jax.jit(_fuse_ids_impl, static_argnums=0)


def _chunk_ids(n: int, chunk: int):
    """(n_chunks, chunk) int32 catalog ids, tail wrapped via clip."""
    n_pad = ((n + chunk - 1) // chunk) * chunk
    return np.minimum(np.arange(n_pad, dtype=np.int32),
                      n - 1).reshape(-1, chunk)


def fused_table_in_graph(model, params, cv_taps, text_taps,
                         chunk: int = 8192):
    """Traceable fused-table build: lax.map over catalog id chunks.

    Same math as compute_item_tables but embeddable inside a larger jitted
    program (the fused epoch+eval dispatch, train/cached.py).  Chunking by
    id (not by padded value slices) keeps the working set at one chunk and
    works for quantized tables.
    """
    n = cv_taps.shape[0]
    ids = jnp.asarray(_chunk_ids(n, chunk))
    fused = jax.lax.map(
        lambda c: _fuse_ids_impl(model, params, cv_taps, text_taps, c), ids)
    return fused.reshape(ids.size, -1)[:n]


def compute_item_tables(model, params, cv_taps, text_taps, chunk: int = 8192):
    """Chunked no-grad SAN pass over the catalog (metrics.py:69-111).

    cv_taps/text_taps: (item_num+1, K, dim) device arrays (or QuantTaps).
    Returns the fused (item_num+1, emb) table.
    """
    n = cv_taps.shape[0]
    outs = [_emb_chunk(model, params, cv_taps, text_taps, jnp.asarray(c))
            for c in _chunk_ids(n, chunk)]
    if len(outs) == 1:
        return outs[0][:n]
    return jnp.concatenate(outs, axis=0)[:n]


def _eval_step_impl(model, params, fused_table, tokens, log_mask, target,
                    history):
    """Per-batch ranking step (metrics.py:207-245 vectorized)."""
    input_embs = jnp.take(fused_table, tokens, axis=0)       # (B, L, emb)
    prec = model.apply(
        {"params": params}, input_embs, log_mask,
        method=model.user_scores)[:, -1, :]                  # (B, emb)
    scores = jnp.dot(
        prec.astype(jnp.float32), fused_table.T.astype(jnp.float32),
        preferred_element_type=jnp.float32)                  # (B, items+1)
    scores = mask_history(scores, history)
    scores = scores[:, 1:]                                   # drop pad col
    return hit_ndcg_at_k(scores, target - 1, k=10)           # (B, 2)


def eval_sharding(mesh, batch_size: int):
    """Per-step-batch sharding over the mesh's data axis (or None): the
    single source of truth shared by evaluate() and the trainers'
    pre-stacked eval batches."""
    if mesh is None or "data" not in mesh.axis_names:
        return None
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_data = mesh.shape["data"]
    spec = P(None, "data") if batch_size % n_data == 0 else P()
    return NamedSharding(mesh, spec)


def stack_eval_batches(arrays, batch_size: int, sharding=None, place=None):
    """Wrap-pad to whole batches (repeat-last-row, the
    SequentialDistributedSampler analog, dataset.py:294-321) and stack to
    (S, B, ...).  Returns (prepped_arrays, n_real_rows).  ``place``
    overrides device placement (trainers pass their own _put)."""
    n = arrays[0].shape[0]
    n_pad = ((n + batch_size - 1) // batch_size) * batch_size
    pad = n_pad - n

    def prep(x):
        x = np.asarray(x)
        if pad:
            x = np.concatenate([x, np.repeat(x[-1:], pad, axis=0)], axis=0)
        x = x.reshape(n_pad // batch_size, batch_size, *x.shape[1:])
        if place is not None:
            return place(x, sharding)
        if sharding is not None:
            from ..parallel.distributed import make_global

            return make_global(x, sharding)
        return jnp.asarray(x)

    return tuple(prep(x) for x in arrays), n


def _eval_scan_impl(model, params, fused_table, tokens, log_mask, target,
                    history):
    """All eval batches in one scan (traceable; shared with the fused
    epoch+eval dispatch).  tokens/...: (S, B, ...) stacked batches.
    Returns (S, B, 2) metrics."""

    def body(_, batch):
        t, m, tg, h = batch
        return None, _eval_step_impl(model, params, fused_table, t, m, tg, h)

    _, out = jax.lax.scan(body, None, (tokens, log_mask, target, history))
    return out


_eval_scan = jax.jit(_eval_scan_impl, static_argnums=0)


def evaluate(model, params, fused_table, tokens, log_mask, target, history,
             batch_size: int = 256, mesh=None) -> Tuple[float, float]:
    """Mean HR@10 / nDCG@10 over all users (eval_model, metrics.py:162-250).

    The whole pass is ONE device dispatch (scan over user batches) - the
    reference's per-user host loop (metrics.py:207-245) and even a
    per-batch dispatch loop pay host round-trips this avoids.

    With ``mesh``, each per-step user batch is sharded over the mesh's
    ``data`` axis - on a multi-host mesh each process materializes only its
    users (the SequentialDistributedSampler analog, dataset.py:294-321) and
    the final mean is the cross-host reduction the reference does with
    dist.all_gather + crop (eval_concat, metrics.py:43-56); wrap-padded
    rows are cropped before the mean exactly like eval_concat.
    """
    sharding = eval_sharding(mesh, batch_size)
    (tokens, log_mask, target, history), n = stack_eval_batches(
        (tokens, log_mask, target, history), batch_size, sharding)

    out = _eval_scan(model, params, fused_table, tokens, log_mask, target,
                     history)
    all_m = out.reshape(-1, 2)[:n]
    hit, ndcg = jnp.mean(all_m, axis=0)
    return float(hit), float(ndcg)
