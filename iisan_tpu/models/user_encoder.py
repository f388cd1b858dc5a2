"""SASRec-style user encoder.

Rebuild of User_Encoder (/root/reference/Code_Cached/model/encoders.py:37-58):
a causal post-LN transformer over the user's item-embedding sequence.  The
additive attention mask is 0 where (key <= query AND log_mask[key] != 0) and
-1e9 elsewhere (encoders.py:53-57).

On TPU the whole encoder (both directions) runs as one fused Pallas kernel
each way (ops/fused_user_encoder.py): at SASRec's tiny geometry (seq 10,
width 64) the unfused XLA lowering is dominated by per-op latency, not
compute.  The module path below remains the semantic reference and the
fallback for CPU tests, init, and unsupported shapes; the fused path reads
the *same* linen parameter tree, so checkpoints, optimizer groups, and
torch-parity weight copies are unaffected.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
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
    """SASRec user tower: TransformerEncoder under a causal mask.

    ``fused=None`` auto-selects the fused Pallas kernel on TPU for
    supported shapes; ``False`` forces the module path, ``True`` forces the
    kernel (still falling back off-TPU / at init).
    """

    max_seq_len: int
    num_attention_heads: int
    n_layers: int
    dropout: float
    dtype: Optional[Any] = None
    fused: Optional[bool] = None

    @nn.compact
    def __call__(self, input_embs, log_mask, deterministic: bool = True):
        mask = causal_additive_mask(log_mask)
        te = TransformerEncoder(
            n_position=self.max_seq_len,
            n_heads=self.num_attention_heads,
            n_layers=self.n_layers,
            dropout=self.dropout,
            dtype=self.dtype,
            name="transformer_encoder",
        )
        if self._use_fused(input_embs):
            from ..ops.fused_user_encoder import apply_fused_encoder

            params = self.variables["params"]["transformer_encoder"]
            rng = None
            if not deterministic and self.dropout > 0.0:
                rng = self.make_rng("dropout")
            # Match the module path's compute dtype (ADVICE r1 medium): a
            # run configured fp32 must not silently drop to bf16 here.
            compute_dtype = jnp.dtype(self.dtype or input_embs.dtype).name
            out = apply_fused_encoder(
                params, input_embs, mask,
                n_layers=self.n_layers,
                n_heads=self.num_attention_heads,
                drop_rate=self.dropout,
                dropout_rng=rng,
                compute_dtype=compute_dtype,
            )
            return out.astype(self.dtype or input_embs.dtype)
        return te(input_embs, mask, deterministic)

    def _use_fused(self, x) -> bool:
        if self.fused is False or self.is_initializing():
            return False
        if jax.default_backend() != "tpu":
            return False
        from ..ops.fused_user_encoder import supported

        B, L, D = x.shape
        return supported(B, L, D, self.num_attention_heads)
