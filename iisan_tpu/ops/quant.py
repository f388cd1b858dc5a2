"""Int8 quantization for cached hidden-state tap tables.

TPU-native extension (no reference analog): the cached pipelines keep the
per-item tap tables ``[item_num+1, K, dim]`` resident in HBM for the whole
run (train/cached.py).  At IISAN-Versa geometry (Llama-3-70B caches:
K=7, dim=8192, /root/reference/Code_Cached_Asym/script/run_IISAN.py:52-64)
one bf16 table is ~2.4 GB on a 16 GB v5e — the tables, not the model, set
the catalog ceiling.  Symmetric per-(item, tap) int8 quantization halves
both residency and per-step gather bandwidth; the dequantize (one multiply)
fuses into the gather consumer under XLA.

Scale granularity is one fp32 scalar per (item, tap-layer) row — the same
row the SAN consumes as a unit — so quantization error is a per-row
relative error bounded by ~0.45% RMS (absmax/127/sqrt(3)), far below the
bf16 activation noise the cascade already runs in.

``QuantTaps`` is a registered pytree, so it passes through ``jax.jit``
boundaries anywhere a plain table array does; every consumer goes through
the polymorphic helpers below (``gather_rows`` / ``n_rows`` / ...), which
accept either form.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
class QuantTaps:
    """Int8 tap table: ``q`` (N, K, D) int8 + ``scale`` (N, K, 1) fp32.

    ``out_dtype`` (static aux data) is the dtype dequantized rows are
    produced in — set to the pipeline's compute dtype at quantize time so
    downstream consumers need no config plumbing.
    """

    def __init__(self, q, scale, out_dtype: str = "bfloat16"):
        self.q = q
        self.scale = scale
        self.out_dtype = str(out_dtype)

    # -- pytree protocol ------------------------------------------------
    def tree_flatten(self):
        return (self.q, self.scale), self.out_dtype

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, out_dtype=aux)

    @property
    def shape(self):
        return self.q.shape

    def __repr__(self):
        return (f"QuantTaps(shape={tuple(self.q.shape)}, "
                f"out_dtype={self.out_dtype})")


def quantize_taps(x: np.ndarray, out_dtype: str = "bfloat16") -> QuantTaps:
    """Host-side symmetric absmax quantization, per (item, tap) row.

    x: (N, K, D) float array.  Returns numpy-backed QuantTaps (callers
    device_put the leaves with their own shardings).
    """
    x = np.asarray(x, dtype=np.float32)
    absmax = np.max(np.abs(x), axis=-1, keepdims=True)  # (N, K, 1)
    scale = (absmax / 127.0).astype(np.float32)
    # all-zero rows (the pad item, unbuilt resume rows) keep scale 0 and
    # quantize to 0 — dequantizing reproduces the zeros exactly
    inv = np.where(scale > 0, 1.0 / np.where(scale > 0, scale, 1.0), 0.0)
    q = np.clip(np.rint(x * inv), -127, 127).astype(np.int8)
    return QuantTaps(q, scale, out_dtype=out_dtype)


def dequantize(t: QuantTaps):
    """Full-table dequantize (tests / small tables only)."""
    return (t.q.astype(np.float32) * np.asarray(t.scale)).astype(
        jnp.dtype(t.out_dtype))


# ---------------------------------------------------------------------------
# Polymorphic table helpers: every consumer of a tap table (the epoch scan,
# the catalog table builders) routes through these, so plain arrays and
# QuantTaps behave identically.
# ---------------------------------------------------------------------------

def n_rows(table) -> int:
    return table.shape[0]


def feature_shape(table):
    """(K, D) of one item's taps."""
    return tuple(table.shape[1:])


def gather_rows(table, ids, mode: str = "clip"):
    """``jnp.take(table, ids, axis=0)`` that dequantizes on the fly.

    For QuantTaps the HBM traffic is the int8 rows + the tiny scales; the
    dequantize multiply happens on the (small) gathered batch and fuses
    into its consumer.
    """
    if isinstance(table, QuantTaps):
        q = jnp.take(table.q, ids, axis=0, mode=mode)
        s = jnp.take(table.scale, ids, axis=0, mode=mode)
        dt = jnp.dtype(table.out_dtype)
        # multiply in fp32 (scale's dtype), then cast: matches the float
        # path, where rows were cast from fp32 host values to out_dtype
        return (q.astype(jnp.float32) * s).astype(dt)
    return jnp.take(table, ids, axis=0, mode=mode)
