"""Sharded hidden-state cache for "IISAN (Cached)" pipelines.

The reference materializes one small ``{prefix}_{item}.pt`` file per item
per tower (/root/reference/Code_Cached/preprocess_vectors.py:27-31) and
re-reads them from the DataLoader every epoch
(Code_Cached/data_utils/dataset.py:29-34,81-86) - tens of thousands of tiny
files whose open/parse cost is why the repo carries an abandoned mmap
workaround (Code_Cached_Asym/data_utils/dataset_cachmem.py, dead code).

TPU-native replacement: ONE dense memory-mapped array per tower,
``[item_num+1, layers+1, dim]`` keyed by dense item id (row 0 = zero padding
item, mirroring Build_MM_EMBED_Eval_Dataset_Cached's zero tensor for id 0,
dataset.py:277-280).  ``load_taps`` gathers only the SAN-selected layers and
returns a device-resident table, after which every training batch is a pure
on-device ``take`` - no host I/O in the hot loop at all.

A compatibility importer converts a reference-layout directory of .pt files
into this format, preserving the capability (not the file format) of
Code_Cached/preprocess_vectors.py output.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Sequence

import numpy as np

META_NAME = "meta.json"
DATA_NAME = "states.bin"
SCALES_NAME = "scales.bin"  # int8 stores: fp32 (n_items, n_layers) sidecar


@dataclass
class CacheMeta:
    n_items: int     # includes the padding row 0
    n_layers: int    # layers + 1 (embeddings first, HF hidden_states order)
    dim: int
    # "float16"/"float32" store raw values; "int8" stores symmetric
    # per-(item, layer)-row quantized values (ops/quant.py) plus a fp32
    # scale sidecar - half the disk and host RAM of fp16, and load_taps
    # then hands the trainer a ready QuantTaps (no fp32 transient at
    # Versa's 25 GB geometry).
    dtype: str = "float16"

    def to_json(self):
        return json.dumps(self.__dict__)


class HiddenStateCache:
    """Dense on-disk per-item hidden-state store."""

    def __init__(self, path: str, meta: CacheMeta, mode: str = "r"):
        self.path = path
        self.meta = meta
        shape = (meta.n_items, meta.n_layers, meta.dim)
        self._arr = np.memmap(
            os.path.join(path, DATA_NAME),
            dtype=np.dtype(meta.dtype),
            mode=mode,
            shape=shape,
        )
        self._scales = None
        if meta.dtype == "int8":
            self._scales = np.memmap(
                os.path.join(path, SCALES_NAME),
                dtype=np.float32,
                mode=mode,
                shape=(meta.n_items, meta.n_layers),
            )

    # ------------------------------------------------------------------
    @classmethod
    def create(cls, path: str, n_items: int, n_layers: int, dim: int,
               dtype: str = "float16",
               resume: bool = False) -> "HiddenStateCache":
        """Fresh store (mode 'w+': truncates!).  With ``resume=True`` and a
        matching existing store, reopen it writable ('r+') instead — the
        builders' start_item resume path; 'w+' there would zero every row
        already built."""
        os.makedirs(path, exist_ok=True)
        meta = CacheMeta(n_items, n_layers, dim, dtype)
        meta_path = os.path.join(path, META_NAME)
        if resume:
            need = [meta_path, os.path.join(path, DATA_NAME)]
            if dtype == "int8":
                need.append(os.path.join(path, SCALES_NAME))
            if not all(os.path.exists(p) for p in need):
                # Falling through to a fresh create would leave every row
                # before start_item all-zero and train on zero features.
                raise FileNotFoundError(
                    f"cannot resume: no existing store at {path} "
                    f"(missing {META_NAME} or {DATA_NAME}); start from "
                    f"item 1 for a fresh build")
            with open(meta_path) as f:
                existing = CacheMeta(**json.loads(f.read()))
            if existing != meta:
                raise ValueError(
                    f"cannot resume into {path}: existing geometry "
                    f"{existing} != requested {meta}")
            return cls(path, meta, mode="r+")
        with open(meta_path, "w") as f:
            f.write(meta.to_json())
        store = cls(path, meta, mode="w+")
        store._arr[0] = 0  # padding item is all-zeros (dataset.py:277-280)
        return store

    @classmethod
    def create_or_open(cls, path: str, n_items: int, n_layers: int,
                       dim: int, dtype: str = "float16") -> "HiddenStateCache":
        """Atomic create-else-open-writable: the sharded-build path.

        N builder processes (one per shard, disjoint row ranges) all call
        this; exactly one wins the O_EXCL meta-file race and sizes the
        files, the rest geometry-check and reopen 'r+'.

        SAME-HOST ONLY for a shared store: disjoint row writes never
        overlap byte ranges, but mmap writeback is page-granular, so the
        processes must share one page cache (one host).  Two *hosts*
        flushing the same file over NFS would each write back whole
        boundary pages from their own cache, clobbering the neighbor
        shard's rows in that page.  Multi-host builds use per-shard
        stores + merge_shard_stores (CLI --shard-files /
        --finalize-shards) instead."""
        os.makedirs(path, exist_ok=True)
        meta = CacheMeta(n_items, n_layers, dim, dtype)
        meta_path = os.path.join(path, META_NAME)
        try:
            fd = os.open(meta_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            import time

            # lost the race: the winner may still be mid-write (or, on
            # NFS with attribute caching, the write may take seconds to
            # become visible) - retry reading for up to 30 s
            raw = ""
            for _ in range(150):
                with open(meta_path) as f:
                    raw = f.read()
                if raw:
                    break
                time.sleep(0.2)
            if not raw:
                raise RuntimeError(
                    f"shard-build: {meta_path} exists but stayed empty for "
                    "30 s - the creator shard likely died mid-create; "
                    f"delete {path} and rerun the shards")
            existing = CacheMeta(**json.loads(raw))
            if existing != meta:
                raise ValueError(
                    f"cannot shard-build into {path}: existing geometry "
                    f"{existing} != requested {meta}")
            # wait (bounded) for the winner to size the data files - 'r+'
            # memmaps require the full length up front
            need = [(os.path.join(path, DATA_NAME),
                     n_items * n_layers * dim * np.dtype(meta.dtype).itemsize)]
            if meta.dtype == "int8":
                need.append((os.path.join(path, SCALES_NAME),
                             n_items * n_layers * 4))
            for p, size in need:
                for _ in range(150):  # <=30 s
                    try:
                        if os.path.getsize(p) >= size:
                            break
                    except OSError:
                        pass
                    time.sleep(0.2)
                else:
                    raise FileNotFoundError(
                        f"shard-build: {p} never reached {size} bytes - the "
                        "creator shard likely died before sizing the files; "
                        f"delete {path} (at least {META_NAME}) and rerun "
                        "the shards")
            return cls(path, meta, mode="r+")
        with os.fdopen(fd, "w") as f:
            f.write(meta.to_json())
        store = cls(path, meta, mode="w+")
        store._arr[0] = 0  # padding item is all-zeros (dataset.py:277-280)
        return store

    @classmethod
    def open(cls, path: str) -> "HiddenStateCache":
        with open(os.path.join(path, META_NAME)) as f:
            meta = CacheMeta(**json.loads(f.read()))
        return cls(path, meta)

    def write_rows(self, start: int, states: np.ndarray):
        """Write a contiguous chunk of per-item states (cache builder path).

        Float stores cast on assignment; an "int8" store quantizes each
        (item, layer) row here and records its scale in the sidecar, so
        builders pass float states regardless of the storage dtype."""
        end = start + states.shape[0]
        if self._scales is not None:
            from ..ops.quant import quantize_taps

            t = quantize_taps(states)
            self._arr[start:end] = t.q
            self._scales[start:end] = t.scale[..., 0]
            return
        self._arr[start:end] = states

    def flush(self):
        self._arr.flush()
        if self._scales is not None:
            self._scales.flush()

    def load_taps(self, layer_ids: Sequence[int], dtype: str = "float32",
                  num_threads: int = 8):
        """Gather only the SAN-selected layers: (n_items, K, dim).

        For BERT-base this halves HBM residency vs the full 13 layers; for
        Llama-3-70B caches (81 layers, 7 selected) it is the difference
        between 26 GB and 2.3 GB on one chip.

        Float stores return a dense ndarray; an "int8" store returns
        QuantTaps (int8 rows + scales, 4x smaller than the fp32 array) -
        CachedTrainer consumes either form.

        The gather is chunked and threaded with ``madvise(WILLNEED)``
        prefetch per chunk: a plain ``arr[:, idx, :]`` on a cold memmap is
        one thread of synchronous page faults in stride-K row hops, which
        measured 86 s at the Llama x EVA geometry (VERSA_SCALE_eva.json) -
        overlapping kernel readahead with the copy recovers most of the
        raw-disk bandwidth even on a 1-core host.
        """
        idx = np.asarray(layer_ids)
        taps = self._gather_items(self._arr, idx, num_threads)
        if self._scales is not None:
            from ..ops.quant import QuantTaps

            s = np.ascontiguousarray(self._scales[:, idx])[..., None]
            return QuantTaps(taps, s, out_dtype=dtype)
        return taps.astype(dtype, copy=False)

    def _gather_items(self, arr: np.memmap, idx: np.ndarray,
                      num_threads: int) -> np.ndarray:
        """arr[:, idx, :] as a parallel chunked copy with readahead."""
        import concurrent.futures as cf
        import mmap as _mmap

        n = arr.shape[0]
        out = np.empty((n, len(idx), arr.shape[2]), arr.dtype)
        if len(idx) == 0:  # preserve arr[:, [], :] semantics (ADVICE r3)
            return out
        # ~64 MB of source rows per chunk: big enough to amortize, small
        # enough that WILLNEED prefetch stays within the page cache.
        row_bytes = arr.shape[1] * arr.shape[2] * arr.dtype.itemsize
        layer_bytes = arr.shape[2] * arr.dtype.itemsize
        chunk = max(1, (64 << 20) // max(row_bytes, 1))
        mm = getattr(arr, "_mmap", None)
        page = getattr(_mmap, "PAGESIZE", 4096)
        # consecutive selected layers coalesce into (first, count) runs so
        # sparse selections (7 of 81 Llama layers) prefetch only their own
        # byte ranges; dense selections stream the whole range instead
        # (sequential readahead beats per-run calls past ~half the layers)
        sorted_idx = np.unique(idx)
        runs, run_start = [], int(sorted_idx[0])
        for a, b in zip(sorted_idx[:-1], sorted_idx[1:]):
            if b != a + 1:
                runs.append((run_start, int(a) - run_start + 1))
                run_start = int(b)
        runs.append((run_start, int(sorted_idx[-1]) - run_start + 1))
        dense = len(sorted_idx) / arr.shape[1] >= 0.5

        def _willneed(start, length):
            start_al = start - start % page
            length += start - start_al
            length = min(length, len(mm) - start_al)
            if length > 0:
                mm.madvise(_mmap.MADV_WILLNEED, start_al, length)

        def advise(lo, hi):
            if mm is None:
                return
            try:
                if dense:
                    _willneed(lo * row_bytes, (hi - lo) * row_bytes)
                else:
                    for i in range(lo, hi):
                        base = i * row_bytes
                        for first, count in runs:
                            _willneed(base + first * layer_bytes,
                                      count * layer_bytes)
            except (AttributeError, ValueError, OSError):
                pass  # madvise is advisory; platforms without it just copy

        def copy(lo):
            hi = min(lo + chunk, n)
            advise(lo, hi)
            out[lo:hi] = arr[lo:hi, idx, :]

        starts = range(0, n, chunk)
        if num_threads <= 1 or n <= chunk:
            for lo in starts:
                copy(lo)
        else:
            with cf.ThreadPoolExecutor(num_threads) as ex:
                # materialize results so worker exceptions propagate
                list(ex.map(copy, starts))
        return out

    def load_full(self, dtype: str = "float32") -> np.ndarray:
        if self._scales is not None:
            return (np.asarray(self._arr, dtype=np.float32)
                    * np.asarray(self._scales, dtype=np.float32)[..., None]
                    ).astype(dtype)
        return np.asarray(self._arr).astype(dtype)


RANGE_NAME = "range.json"  # shard stores: {"lo": int, "hi": int}


def write_shard_range(path: str, lo: int, hi: int) -> None:
    with open(os.path.join(path, RANGE_NAME), "w") as f:
        json.dump({"lo": lo, "hi": hi}, f)


def merge_shard_stores(out_path: str, remove_shards: bool = True,
                       chunk: int = 4096) -> "HiddenStateCache":
    """Merge ``{out_path}.shard*`` per-shard stores into one final store.

    The multi-host sharded-build finalizer: each shard wrote its own
    full-geometry (sparse) store plus a range.json, so no two processes
    ever touched one file and mmap page-writeback coherence never comes
    into play (see create_or_open).  Run once, on any host, after all
    shards finish."""
    import glob
    import shutil

    shard_dirs = sorted(glob.glob(out_path.rstrip("/\\") + ".shard*"))
    if not shard_dirs:
        raise FileNotFoundError(f"no shard stores match {out_path}.shard*")
    metas, ranges = [], []
    for d in shard_dirs:
        with open(os.path.join(d, META_NAME)) as f:
            metas.append(CacheMeta(**json.loads(f.read())))
        with open(os.path.join(d, RANGE_NAME)) as f:
            r = json.loads(f.read())
        ranges.append((r["lo"], r["hi"]))
    if any(m != metas[0] for m in metas):
        raise ValueError(f"shard stores disagree on geometry: {metas}")
    ordered = sorted(zip(ranges, shard_dirs))
    expect = 1
    for (lo, hi), _ in ordered:
        if lo != expect:
            raise ValueError(
                f"shard ranges do not tile rows 1..{metas[0].n_items - 1}: "
                f"expected next range to start at {expect}, got {lo} "
                f"(ranges: {sorted(ranges)}) - is a shard still "
                "running/missing?")
        expect = hi
    if expect != metas[0].n_items:
        raise ValueError(
            f"shard ranges stop at {expect}, not {metas[0].n_items} "
            f"(ranges: {sorted(ranges)}) - is the last shard missing?")

    m = metas[0]
    staging = out_path.rstrip("/\\") + ".merging"
    final = HiddenStateCache.create(staging, m.n_items, m.n_layers, m.dim,
                                    m.dtype)
    for (lo, hi), d in ordered:
        src = HiddenStateCache(d, m, mode="r")
        for s in range(lo, hi, chunk):
            e = min(s + chunk, hi)
            final._arr[s:e] = src._arr[s:e]
            if final._scales is not None:
                final._scales[s:e] = src._scales[s:e]
        del src
    final.flush()
    del final
    if os.path.isdir(out_path):
        shutil.rmtree(out_path)
    os.rename(staging, out_path)
    if remove_shards:
        for d in shard_dirs:
            shutil.rmtree(d)
    return HiddenStateCache.open(out_path)


def import_reference_pt_dir(
    pt_dir: str,
    prefix: str,
    item_names: Sequence[str],
    out_path: str,
    dtype: str = "float16",
    key_fn=None,
) -> HiddenStateCache:
    """Convert a reference-layout ``{prefix}_{key}.pt`` directory into a
    HiddenStateCache (dense ids follow ``item_names``; row 0 stays zero).

    Mirrors the load path of dataset.py:29-34; requires torch (cpu).
    """
    import torch  # local import: torch is only needed for legacy migration

    first = None
    for name in item_names[1:]:
        key = key_fn(name) if key_fn else name
        p = os.path.join(pt_dir, f"{prefix}_{key}.pt")
        if os.path.exists(p):
            first = torch.load(p, map_location="cpu")
            break
    if first is None:
        raise FileNotFoundError(f"no {prefix}_*.pt files under {pt_dir}")
    n_layers, dim = first.shape
    # Import into a staging dir and rename on completion: a crash or a
    # missing per-item file must not leave a directory that open_cache
    # would treat as a complete cache with zero-filled tail rows.
    staging = out_path.rstrip("/\\") + ".importing"
    store = HiddenStateCache.create(staging, len(item_names), n_layers,
                                    dim, dtype)
    for i, name in enumerate(item_names):
        if i == 0:
            continue
        key = key_fn(name) if key_fn else name
        p = os.path.join(pt_dir, f"{prefix}_{key}.pt")
        if not os.path.exists(p):
            raise FileNotFoundError(
                f"{p} missing — the reference .pt directory is incomplete "
                f"(item {i}/{len(item_names) - 1}); finish the reference "
                "build (its skip-existing resume fills gaps) and re-import")
        t = torch.load(p, map_location="cpu")
        # hand float rows to write_rows: float stores cast on assignment,
        # int8 stores quantize there (a pre-.astype('int8') would integer-
        # truncate the mostly-in-[-1,1] states to zeros)
        store.write_rows(i, t.numpy().astype(np.float32)[None])
    store.flush()
    del store
    if os.path.isdir(out_path):
        import shutil

        shutil.rmtree(out_path)
    os.rename(staging, out_path)
    return HiddenStateCache(out_path, CacheMeta(len(item_names), n_layers,
                                                dim, dtype), mode="r")
