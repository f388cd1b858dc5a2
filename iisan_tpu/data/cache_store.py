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

        N builder processes (one per host/shard, disjoint row ranges,
        shared filesystem) all call this; exactly one wins the O_EXCL
        meta-file race and sizes the files, the rest geometry-check and
        reopen 'r+'.  Disjoint row writes into one memmap never overlap
        byte ranges, so no further coordination is needed."""
        os.makedirs(path, exist_ok=True)
        meta = CacheMeta(n_items, n_layers, dim, dtype)
        meta_path = os.path.join(path, META_NAME)
        try:
            fd = os.open(meta_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            with open(meta_path) as f:
                raw = f.read()
            if not raw:  # lost the race mid-write: tiny window, spin once
                import time

                time.sleep(0.2)
                with open(meta_path) as f:
                    raw = f.read()
            existing = CacheMeta(**json.loads(raw))
            if existing != meta:
                raise ValueError(
                    f"cannot shard-build into {path}: existing geometry "
                    f"{existing} != requested {meta}")
            # wait (bounded) for the winner to size the data files - 'r+'
            # memmaps require the full length up front
            import time

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
                        f"shard-build: {p} never reached {size} bytes "
                        "(creator shard died?)")
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

    # ------------------------------------------------------------------
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

    def load_taps(self, layer_ids: Sequence[int], dtype: str = "float32"):
        """Gather only the SAN-selected layers: (n_items, K, dim).

        For BERT-base this halves HBM residency vs the full 13 layers; for
        Llama-3-70B caches (81 layers, 7 selected) it is the difference
        between 26 GB and 2.3 GB on one chip.

        Float stores return a dense ndarray; an "int8" store returns
        QuantTaps (int8 rows + scales, 4x smaller than the fp32 array) -
        CachedTrainer consumes either form.
        """
        idx = np.asarray(layer_ids)
        if self._scales is not None:
            from ..ops.quant import QuantTaps

            q = np.ascontiguousarray(self._arr[:, idx, :])
            s = np.ascontiguousarray(self._scales[:, idx])[..., None]
            return QuantTaps(q, s, out_dtype=dtype)
        return np.ascontiguousarray(self._arr[:, idx, :]).astype(dtype)

    def load_full(self, dtype: str = "float32") -> np.ndarray:
        if self._scales is not None:
            return (np.asarray(self._arr, dtype=np.float32)
                    * np.asarray(self._scales, dtype=np.float32)[..., None]
                    ).astype(dtype)
        return np.asarray(self._arr).astype(dtype)


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
        store.write_rows(i, t.numpy().astype(dtype)[None])
    store.flush()
    del store
    if os.path.isdir(out_path):
        import shutil

        shutil.rmtree(out_path)
    os.rename(staging, out_path)
    return HiddenStateCache(out_path, CacheMeta(len(item_names), n_layers,
                                                dim, dtype), mode="r")
