"""Hidden-state cache builder: the ``preprocess_vectors.py`` replacement.

The reference runs the frozen towers over the item catalog once, stacking
the CLS vector of every hidden layer per item, and writes one small ``.pt``
file per item per tower (/root/reference/Code_Cached/preprocess_vectors.py:
68-112); the Versa builders repeat the pattern per encoder, with Llama
variants mean-pooling tokens per layer instead of CLS
(Code_Cached_Asym/preprocess_llama-3-70b_micro.py:67-70) and the EVA builder
supporting skip-existing resume (process_eva_clip_vectors.py:54-57).

TPU rebuild: one jitted batched tower forward per catalog chunk with a
double-buffered host image/tokens feed, hidden-state CLS (or mean-pool)
computed on device, results streamed into the dense memmap
HiddenStateCache (data/cache_store.py) - no tiny-file storm.  Resume is a
row-granular ``start_item``: pass the first row still missing and the
existing store is reopened writable (geometry-checked) instead of
truncated.
"""

from __future__ import annotations

import functools
import logging
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .data.cache_store import HiddenStateCache
from .data.images import ParallelImageLoader

log = logging.getLogger("iisan_tpu")


@functools.partial(jax.jit, static_argnums=(0, 3))
def _text_states(bert, params, tokens, pool: str = "cls"):
    """(B, 2*num_words) packed tokens -> (B, layers+1, D) per-layer states.

    pool="cls": hidden[:, 0] (preprocess_vectors.py:89-92);
    pool="mean": attention-masked token mean per layer (the Llama builders,
    preprocess_llama-3-70b_micro.py:67-70).

    When the encoder supports reduced collection (BertEncoder.collect) the
    per-layer reduction happens inside the tower pass - the full
    (L+1, B, T, D) stack (104 MB per ViT-base batch) never exists.
    """
    n = tokens.shape[1] // 2
    ids, mask = tokens[:, :n], tokens[:, n:]
    if hasattr(bert, "collect"):
        import dataclasses

        bert = dataclasses.replace(
            bert, collect="cls" if pool == "cls" else "mean")
        _, hiddens = bert.apply({"params": params}, ids, mask)  # (L+1, B, D)
        return hiddens.transpose(1, 0, 2)
    _, hiddens = bert.apply({"params": params}, ids, mask)  # (L+1, B, T, D)
    if pool == "cls":
        out = hiddens[:, :, 0, :]
    else:
        w = mask.astype(jnp.float32)[None, :, :, None]
        out = jnp.sum(hiddens * w, axis=2) / jnp.maximum(
            jnp.sum(w, axis=2), 1.0)
    return out.transpose(1, 0, 2)  # (B, L+1, D)


@functools.partial(jax.jit, static_argnums=0)
def _image_states(vit, params, images_u8):
    from .data.images import normalize_images

    images = normalize_images(images_u8, jnp.float32)
    if hasattr(vit, "collect"):
        import dataclasses

        vit = dataclasses.replace(vit, collect="cls")
        _, hiddens = vit.apply({"params": params}, images)  # (L+1, B, D)
        return hiddens.transpose(1, 0, 2)
    _, hiddens = vit.apply({"params": params}, images)  # (L+1, B, T, D)
    return hiddens[:, :, 0, :].transpose(1, 0, 2)


def _make_store(out_path, n, n_layers, dim, dtype, start_item, end_item):
    """Create/open per the build mode: fresh, start_item resume, or a
    sharded range (end_item set -> concurrent-safe create_or_open; each
    shard writes only its disjoint [start_item, end_item) rows)."""
    if end_item is not None:
        return HiddenStateCache.create_or_open(out_path, n, n_layers, dim,
                                               dtype)
    return HiddenStateCache.create(out_path, n, n_layers, dim, dtype,
                                   resume=start_item > 1)


def build_text_cache(bert, params, token_table: np.ndarray, out_path: str,
                     batch: int = 128, pool: str = "cls",
                     dtype: str = "float16",
                     start_item: int = 1,
                     end_item: int | None = None) -> HiddenStateCache:
    """token_table: (item_num+1, 2*num_words); row 0 = padding (zeros)."""
    n = token_table.shape[0]
    # shape-only trace: learns (layers+1, D) without compiling or running
    # an extra batch-1 tower program
    probe = jax.eval_shape(lambda p, t: _text_states(bert, p, t, pool),
                           params, token_table[:1])
    n_layers, dim = probe.shape[1], probe.shape[2]
    store = _make_store(out_path, n, n_layers, dim, dtype,
                        start_item, end_item)
    stop = n if end_item is None else min(end_item, n)
    for s in range(start_item, stop, batch):
        e = min(s + batch, stop)
        toks = np.resize(token_table[s:e], (batch, token_table.shape[1]))
        states = _text_states(bert, params, jnp.asarray(toks), pool)
        # write_rows casts (or quantizes, dtype="int8") to the store dtype
        store.write_rows(s, np.asarray(states[: e - s]))
        if (s // batch) % 20 == 0:
            log.info("text cache %d/%d", e, stop)
    store.flush()
    return store


def build_image_cache(vit, params, item_names: Sequence[str], image_store,
                      out_path: str, resize: int = 224, batch: int = 128,
                      dtype: str = "float16",
                      start_item: int = 1,
                      end_item: int | None = None) -> HiddenStateCache:
    n = len(item_names)
    probe = jax.eval_shape(
        lambda p, im: _image_states(vit, p, im), params,
        jax.ShapeDtypeStruct((1, resize, resize, 3), jnp.uint8))
    n_layers, dim = probe.shape[1], probe.shape[2]
    store = _make_store(out_path, n, n_layers, dim, dtype,
                        start_item, end_item)
    loader = ParallelImageLoader(image_store)
    stop = n if end_item is None else min(end_item, n)
    spans = [(s, min(s + batch, stop)) for s in range(start_item, stop, batch)]
    name_batches = [
        [item_names[i] for i in np.resize(np.arange(s, e), batch)]
        for s, e in spans
    ]
    for (s, e), images in zip(spans, loader.iter_batches(name_batches)):
        states = _image_states(vit, params, jnp.asarray(images))
        store.write_rows(s, np.asarray(states[: e - s]))
        if (s // batch) % 20 == 0:
            log.info("image cache %d/%d", e, stop)
    store.flush()
    return store


def verify_cache(store: HiddenStateCache, expect_layers: int,
                 expect_dim: int, first_row: int = 0) -> None:
    """Shape smoke check - the ``test()`` of every reference builder
    (preprocess_vectors.py:153-161).  ``first_row``: first row this
    process actually built (sharded builds check their own range)."""
    m = store.meta
    assert (m.n_layers, m.dim) == (expect_layers, expect_dim), \
        f"cache shape {(m.n_layers, m.dim)} != {(expect_layers, expect_dim)}"
    row = store.load_taps([0])
    from .ops.quant import QuantTaps, dequantize

    if isinstance(row, QuantTaps):
        # slice the checked rows BEFORE dequantizing - a full-catalog
        # dequantize materializes (n_items, 1, dim) fp32 just to look at
        # two rows
        row = QuantTaps(row.q[first_row:first_row + 2],
                        row.scale[first_row:first_row + 2],
                        out_dtype=row.out_dtype)
        row = np.asarray(dequantize(row), dtype=np.float32)
        assert np.all(np.isfinite(row))
    else:
        assert np.all(np.isfinite(row[first_row:first_row + 2]))
    log.info("cache ok: %d items x %d layers x %d dim",
             m.n_items, m.n_layers, m.dim)
