"""SASRec-style user encoder.

Rebuild of User_Encoder (/root/reference/Code_Cached/model/encoders.py:37-58):
a causal post-LN transformer over the user's item-embedding sequence.  The
additive attention mask is 0 where (key <= query AND log_mask[key] != 0) and
-1e9 elsewhere (encoders.py:53-57).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from .modules import TransformerEncoder


def causal_additive_mask(log_mask: jnp.ndarray) -> jnp.ndarray:
    """(bs, L) float/int log_mask -> (bs, 1, L, L) additive mask of {0, -1e9}.

    Matches encoders.py:54-57: att_mask = tril(expand(log_mask != 0)),
    then where(att_mask, 0, -1e9).
    """
    l = log_mask.shape[-1]
    key_ok = (log_mask != 0)[:, None, None, :]  # (bs, 1, 1, L)
    causal = jnp.tril(jnp.ones((l, l), dtype=bool))[None, None, :, :]
    ok = jnp.logical_and(key_ok, causal)
    return jnp.where(ok, 0.0, -1e9).astype(jnp.float32)


class UserEncoder(nn.Module):
    """SASRec user tower: TransformerEncoder under a causal mask."""

    max_seq_len: int
    num_attention_heads: int
    n_layers: int
    dropout: float
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, input_embs, log_mask, deterministic: bool = True):
        mask = causal_additive_mask(log_mask)
        return TransformerEncoder(
            n_position=self.max_seq_len,
            n_heads=self.num_attention_heads,
            n_layers=self.n_layers,
            dropout=self.dropout,
            dtype=self.dtype,
            name="transformer_encoder",
        )(input_embs, mask, deterministic)
