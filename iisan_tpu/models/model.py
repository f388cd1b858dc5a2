"""Top-level recommendation models.

``IISANRecModel`` is the TPU rebuild of ModelMM + IISANAdaptedMModel
(/root/reference/Code_Cached/model/model.py:15-105,257-349): SAN item
encoder -> com_dense modality fusion -> SASRec user encoder -> in-batch
debiased CE loss.  In cached mode its inputs are tap tensors gathered from
the hidden-state cache; in uncached mode the frozen towers (models/bert.py,
models/vit.py) produce the same taps in-graph.

``IDRecModel`` is the id-only baseline (ModelMM's use_modal=False branch,
model.py:35-36) and ``FFTRecModel`` the two-tower full-fine-tune baseline
(model.py:109-195) lives in models/towers.py.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from ..ops.losses import sequence_train_loss
from .modules import TorchLinear
from .san import SideAdapterNetwork, san_from_config
from .user_encoder import UserEncoder


class ComDense(nn.Module):
    """Modality-fusion projection (model.py:37-42,67-74).

    intra_inter: Linear(3*emb -> emb) on [cv, text, mm];
    inter:       Linear(emb -> emb) on mm;
    otherwise:   Linear(2*emb -> emb) on [cv, text].
    """

    embedding_dim: int
    modality: str
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, emb_cv, emb_text, emb_mm):
        if "intra_inter" in self.modality:
            x = jnp.concatenate([emb_cv, emb_text, emb_mm], axis=-1)
        elif "inter" in self.modality:
            x = emb_mm
        else:
            x = jnp.concatenate([emb_cv, emb_text], axis=-1)
        return TorchLinear(self.embedding_dim, dtype=self.dtype, name="com_dense")(x)


class IISANRecModel(nn.Module):
    """SAN + fusion + user encoder; methods for train loss, item embedding
    tables, and user scoring so eval reuses the same bound module."""

    san: SideAdapterNetwork
    embedding_dim: int
    max_seq_len: int
    num_attention_heads: int
    transformer_block: int
    drop_rate: float
    modality: str = "intra_inter"
    dtype: Optional[Any] = None
    fused_user_encoder: Optional[bool] = None  # None=auto (TPU), False=off

    def setup(self):
        self.user_encoder = UserEncoder(
            max_seq_len=self.max_seq_len,
            num_attention_heads=self.num_attention_heads,
            n_layers=self.transformer_block,
            dropout=self.drop_rate,
            dtype=self.dtype,
            fused=self.fused_user_encoder,
        )
        self.fuse = ComDense(self.embedding_dim, self.modality, dtype=self.dtype)

    def item_embeddings(self, cv_states, text_states):
        """Per-modality item embeddings from tap tensors: the eval tables of
        get_MM_item_embeddings (metrics.py:69-111)."""
        return self.san(cv_states, text_states)

    def fuse_embeddings(self, emb_cv, emb_text, emb_mm):
        return self.fuse(emb_cv, emb_text, emb_mm)

    def user_scores(self, input_embs, log_mask, deterministic=True):
        """Run the user tower; returns (B, L, emb)."""
        return self.user_encoder(input_embs, log_mask, deterministic)

    def __call__(
        self,
        item_ids,       # (bs, L+1)
        cv_states,      # (bs*(L+1), K_cv, image_dim) tap tensors
        text_states,    # (bs*(L+1), K_text, text_dim)
        log_mask,       # (bs, L)
        pop_prob,       # (item_num+1,)
        deterministic: bool = False,
    ):
        """Training forward -> scalar loss (ModelMM.forward, model.py:61-105)."""
        emb_cv, emb_text, emb_mm = self.san(cv_states, text_states)
        score_embs = self.fuse(emb_cv, emb_text, emb_mm)  # (bs*(L+1), emb)
        return sequence_train_loss(self.user_encoder, score_embs, item_ids,
                                   log_mask, pop_prob, self.max_seq_len,
                                   self.embedding_dim, deterministic)


class IDRecModel(nn.Module):
    """ID-embedding baseline (ModelMM use_modal=False, model.py:35-36):
    item embeddings come from a learned table instead of the SAN."""

    item_num: int
    embedding_dim: int
    max_seq_len: int
    num_attention_heads: int
    transformer_block: int
    drop_rate: float
    dtype: Optional[Any] = None
    fused_user_encoder: Optional[bool] = None

    def setup(self):
        self.id_embedding = nn.Embed(
            self.item_num + 1,
            self.embedding_dim,
            embedding_init=nn.initializers.xavier_normal(),
        )
        self.user_encoder = UserEncoder(
            max_seq_len=self.max_seq_len,
            num_attention_heads=self.num_attention_heads,
            n_layers=self.transformer_block,
            dropout=self.drop_rate,
            dtype=self.dtype,
            fused=self.fused_user_encoder,
        )

    def item_table(self):
        return self.id_embedding.embedding

    def user_scores(self, input_embs, log_mask, deterministic=True):
        return self.user_encoder(input_embs, log_mask, deterministic)

    def __call__(self, item_ids, log_mask, pop_prob, deterministic=False):
        score_embs = self.id_embedding(item_ids.reshape(-1))
        return sequence_train_loss(self.user_encoder, score_embs, item_ids,
                                   log_mask, pop_prob, self.max_seq_len,
                                   self.embedding_dim, deterministic)


def rec_model_from_config(cfg) -> IISANRecModel:
    return IISANRecModel(
        san=san_from_config(cfg),
        embedding_dim=cfg.embedding_dim,
        max_seq_len=cfg.max_seq_len,
        num_attention_heads=cfg.num_attention_heads,
        transformer_block=cfg.transformer_block,
        drop_rate=cfg.drop_rate,
        modality=cfg.modality,
        dtype=jnp.dtype(cfg.compute_dtype),
        fused_user_encoder=None if getattr(cfg, "fused_user_encoder", True)
        else False,
    )
