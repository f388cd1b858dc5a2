"""Host-side image stores and decode pipeline for uncached training.

The reference stores raw uint8 RGB images in LMDB (pickled ``LMDB_Image``
records keyed by item name, /root/reference/Dataset/build_lmdb.py:13-86) and
decodes+resizes+normalizes per sample inside DataLoader workers
(Code_Uncached/data_utils/dataset.py:123-144).  Uncached training is
dataloader-bound (11 images x 224^2 per sample), so this module provides:

  * ``LmdbImageStore`` - reads the reference's exact LMDB format via the
    ``lmdb`` package when installed; on hosts without liblmdb the
    pure-Python backend (lmdbfile.py) reads and writes the real LMDB
    on-disk format itself, so reference-produced ``.lmdb`` files work
    with no native dependency (docs/PARITY.md);
  * ``DirImageStore`` - plain directory of JPEG/PNG files keyed by item
    name (no LMDB dependency);
  * ``SyntheticImageStore`` - deterministic random images for CI/bench;
  * ``ParallelImageLoader`` - a thread-pool decode + double-buffered
    prefetch pipeline feeding the TPU, replacing torch DataLoader workers.

Store output layout is channels-last (H, W, 3) **uint8**: raw bytes cross
the host->device boundary (4x less transfer than float32) and the
reference's +-0.5 normalization (dataset.py:54-59) runs on-device via
``normalize_images`` inside the jitted step.  Channels-last is the layout
our ViT patchify consumes without transposes.
"""

from __future__ import annotations

import os
import pickle
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterable, Iterator, Sequence

import numpy as np

try:  # optional: the reference's storage backend (native liblmdb)
    import lmdb  # type: ignore
    HAS_LMDB = True
    LMDB_IS_PUREPY = False
except ImportError:  # no liblmdb: pure-Python real-format implementation
    from . import lmdbfile as lmdb  # type: ignore

    HAS_LMDB = True
    LMDB_IS_PUREPY = True


def _resize_u8(img_u8: np.ndarray, resize: int) -> np.ndarray:
    """uint8 HWC RGB -> resized uint8 HWC.

    Stores ship RAW uint8 to the device; the +-0.5 normalization of
    dataset.py:54-59 happens on-device (see ``normalize_images``) so each
    image crosses the host->device boundary at 1 byte/pixel instead of 4 -
    4x less PCIe/tunnel traffic, and the divide fuses into the first
    matmul's prologue under XLA.
    """
    from PIL import Image

    im = Image.fromarray(img_u8).convert("RGB").resize(
        (resize, resize), Image.BILINEAR)
    return np.asarray(im, dtype=np.uint8)


def _to_model_input(img_u8: np.ndarray, resize: int) -> np.ndarray:
    """Legacy float path: resized float32 HWC in [-1, 1]."""
    arr = _resize_u8(img_u8, resize).astype(np.float32) / 255.0
    return arr * 2.0 - 1.0


def normalize_images(u8, dtype):
    """On-device uint8 -> [-1, 1] (Normalize((.5,)*3, (.5,)*3) on ToTensor
    output, dataset.py:54-59).  Call inside jit."""
    return u8.astype(dtype) * (2.0 / 255.0) - 1.0


class LMDBImage:
    """Pickle-compatible record layout of Dataset/build_lmdb.py:13-23."""

    def __init__(self, image: np.ndarray, id):
        self.channels = image.shape[2]
        self.size = image.shape[:2]
        self.image = image.tobytes()
        self.id = id

    def get_image(self) -> np.ndarray:
        arr = np.frombuffer(self.image, dtype=np.uint8)
        return arr.reshape(*self.size, self.channels)


def is_lmdb_path(path: str) -> bool:
    """True when ``path`` is an LMDB source: a single data file, or the
    directory form lmdb itself writes (``data.mdb`` inside). A plain
    directory of JPEGs is NOT an LMDB and routes to DirImageStore."""
    if not path:
        return False
    return os.path.isfile(path) or os.path.isfile(
        os.path.join(path, "data.mdb"))


class LmdbImageStore:
    """Reads the reference LMDB layout (keys = ascii item names, plus
    __keys__/__len__ metadata; cached variants strip 'v' from names,
    Code_Cached/data_utils/preprocess.py:105)."""

    def __init__(self, db_path: str, resize: int = 224, strip_v: bool = False):
        self.env = lmdb.open(db_path, subdir=os.path.isdir(db_path),
                             readonly=True, lock=False, readahead=False,
                             meminit=False)
        self.resize = resize
        self.strip_v = strip_v

    def key(self, name: str) -> bytes:
        if self.strip_v:
            name = name.replace("v", "")
        return name.encode("ascii")

    def get(self, name: str) -> np.ndarray:
        with self.env.begin() as txn:
            raw = txn.get(self.key(name))
        rec = pickle.loads(raw)
        return _resize_u8(rec.get_image(), self.resize)


class DirImageStore:
    """Directory of ``{name}.jpg`` files - the LMDB-free path.

    JPEG decode goes through the native C++ library when built
    (native/fastimage.cc: libjpeg with DCT-domain downscale fused into
    decode + bilinear remainder; the ctypes call releases the GIL so the
    loader's prefetch threads truly overlap); PIL is the fallback and the
    path for non-JPEG files.
    """

    def __init__(self, root: str, resize: int = 224, ext: str = ".jpg",
                 use_native: bool = True):
        from . import fastimage

        self.root = root
        self.resize = resize
        self.ext = ext
        self._native = use_native and ext.lower() in (".jpg", ".jpeg") \
            and fastimage.available()

    def get(self, name: str) -> np.ndarray:
        path = os.path.join(self.root, name + self.ext)
        if self._native:
            from . import fastimage

            with open(path, "rb") as f:
                out = fastimage.decode_resize_batch([f.read()], self.resize,
                                                    n_threads=1)[0]
            if out.any():
                return out
            # undecodable via libjpeg (e.g. mislabeled PNG) -> PIL fallback
        from PIL import Image

        im = Image.open(path)
        return _resize_u8(np.asarray(im.convert("RGB")), self.resize)


class SyntheticImageStore:
    """Deterministic per-name random images (CI / benchmarking)."""

    def __init__(self, resize: int = 224):
        self.resize = resize

    def get(self, name: str) -> np.ndarray:
        seed = abs(hash(name)) % (2 ** 31)
        rng = np.random.default_rng(seed)
        return rng.integers(0, 256, (self.resize, self.resize, 3),
                            dtype=np.uint8)


class ParallelImageLoader:
    """Thread-pool decode with double-buffered prefetch.

    Replaces torch DataLoader workers (Code_Uncached/run.py:134-135): the
    caller iterates batches of item names; decode of batch k+1 overlaps the
    device step on batch k (prefetch depth 2).
    """

    def __init__(self, store, num_threads: int = 8, prefetch: int = 2):
        self.store = store
        self.pool = ThreadPoolExecutor(max_workers=num_threads)
        self.prefetch = prefetch
        resize = getattr(store, "resize", 224)
        # Padding positions (item id 0) never hit the store: the reference
        # feeds a zero tensor for pads (Code_Uncached/data_utils/
        # dataset.py:66-70); a ``None`` name short-circuits to this.
        self._pad_image = np.zeros((resize, resize, 3), dtype=np.uint8)

    def iter_batches(self, name_batches: Iterable[Sequence[str]]
                     ) -> Iterator[np.ndarray]:
        it = iter(name_batches)
        # Bounded queue: blocking put() paces the producer to the consumer.
        # The producer submits only per-image leaf tasks (no nested batch
        # tasks on the same pool - nesting can deadlock the executor).
        pending: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        done = object()

        def submit_all():
            for names in it:
                futs = [self.pool.submit(self.store.get, n)
                        if n is not None else None for n in names]
                pending.put(futs)
            pending.put(done)

        t = threading.Thread(target=submit_all, daemon=True)
        t.start()
        while True:
            futs = pending.get()
            if futs is done:
                break
            yield np.stack([f.result() if f is not None else self._pad_image
                            for f in futs])


def build_lmdb(items_tsv: str, image_dir: str, out_path: str,
               commit_every: int = 5000):
    """Build the reference-layout LMDB from a directory of JPEGs -
    capability parity with Dataset/build_lmdb.py:25-86.  Uses the real
    ``lmdb`` package when installed, else the pure-Python backend
    (data/lmdbfile.py) which writes the same on-disk LMDB format."""
    import pandas as pd
    from PIL import Image

    df = pd.read_table(items_tsv, header=None)
    names = df[0].tolist()
    env = lmdb.open(out_path, subdir=False, map_size=2 ** 40,
                    readonly=False, meminit=False, map_async=True)
    txn = env.begin(write=True)
    keys, bad = [], []
    for i, name in enumerate(names):
        try:
            img = np.asarray(
                Image.open(os.path.join(image_dir, name + ".jpg")).convert("RGB"))
        except Exception:
            bad.append(name)
            continue
        key = name.encode("ascii")
        txn.put(key, pickle.dumps(LMDBImage(img, name)))
        keys.append(key)
        # Intermediate commits match the reference's batching with real
        # lmdb (cheap incremental writes there); the pure-Python backend
        # rewrites the whole file per commit, so batched commits would be
        # O(N^2) disk traffic at catalog scale - commit once at the end.
        if (i + 1) % commit_every == 0 and not LMDB_IS_PUREPY:
            txn.commit()
            txn = env.begin(write=True)
    txn.put(b"__keys__", pickle.dumps(keys))
    txn.put(b"__len__", pickle.dumps(len(keys)))
    txn.commit()
    env.sync()
    env.close()
    return bad
