"""Flax BERT encoder with per-layer hidden-state taps.

TPU-native replacement for the HuggingFace torch ``BertModel`` the reference
loads frozen (/root/reference/Code_Cached/run.py:58-81) and runs with
``output_hidden_states=True`` (encoders.py:78-80); the cache builder stacks
the CLS vector of each of the 13 hidden states (embeddings + 12 layers,
preprocess_vectors.py:85-92).

Faithful BERT-base semantics: learned word/position/token-type embeddings +
LayerNorm(eps 1e-12), post-LN encoder blocks with GELU intermediate.  The
model is frozen in every IISAN config (run.py:79-81), so parameters are held
in a separate "frozen" collection: they are inputs to jit, not optimizer
state, and XLA keeps them in bf16 HBM untouched.

``hidden_states`` returned as one stacked array (L+1, B, T, D) rather than a
python tuple - one array = one HBM layout XLA can slice for the SAN taps.

Weight import: ``params_from_hf_torch`` maps a torch state_dict (from
transformers' BertModel) onto this tree; verified against transformers'
reference implementation in tests/test_towers.py.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class BertSelfAttention(nn.Module):
    num_heads: int
    dtype: Any = jnp.float32
    dropout: float = 0.1
    lora_rank: int = 0  # LoRA on q/v projections (run.py:170-176 analog)
    # Fused Pallas attention (ops/fused_attention.py); the key-bias mask
    # and attention dropout (on-chip PRNG) are both supported, forward
    # and backward — the bwd kernel replays the PRNG masks — so both
    # frozen-tower IISAN and the tower-training methods (FFT/LoRA/
    # Houlsby/BitFit) enable this (towers.py gating).
    fused: bool = False
    # "int8": W8A8 projections on the MXU (ops/int8_linear.py) — frozen
    # towers only (config.validate gates on towers_frozen()).
    quant: str = "none"

    @nn.compact
    def __call__(self, x, attn_bias, deterministic: bool = True):
        from ..ops.int8_linear import dense_or_int8
        from .peft import LoRADense

        d = x.shape[-1]
        dh = d // self.num_heads
        if self.lora_rank > 0:
            q = LoRADense(d, self.lora_rank, self.dtype, name="query")(x)
            v = LoRADense(d, self.lora_rank, self.dtype, name="value")(x)
        else:
            q = dense_or_int8(d, self.dtype, "query", self.quant)(x)
            v = dense_or_int8(d, self.dtype, "value", self.quant)(x)
        k = dense_or_int8(d, self.dtype, "key", self.quant)(x)
        b, t = x.shape[0], x.shape[1]

        if (self.fused and jax.default_backend() == "tpu"
                and not self.is_initializing()):
            from ..ops.fused_attention import fused_mha, supported

            if supported(b, t, d, self.num_heads, x.dtype.itemsize):
                # attn_bias is (B, 1, 1, T) additive (0 / -1e9).
                key_bias = attn_bias.reshape(b, t)
                rng = None
                if not deterministic and self.dropout > 0.0:
                    rng = self.make_rng("dropout")
                return fused_mha(q, k, v, self.num_heads, key_bias=key_bias,
                                 drop_rate=self.dropout, dropout_rng=rng)

        def split(y):
            return y.reshape(b, t, self.num_heads, dh).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits / math.sqrt(dh) + attn_bias
        p = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        p = nn.Dropout(self.dropout)(p, deterministic=deterministic)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v,
                       preferred_element_type=jnp.float32).astype(self.dtype)
        return o.transpose(0, 2, 1, 3).reshape(b, t, d)


class BertLayer(nn.Module):
    num_heads: int
    intermediate_dim: int
    dtype: Any = jnp.float32
    dropout: float = 0.1
    lora_rank: int = 0
    houlsby_down: int = 0       # Houlsby adapters (model.py:198-222 analog)
    adapter_activation: str = "RELU"
    # False | True (fused_mha) | "subblock" (one Pallas call for
    # qkv proj + MHA + out proj, ops/fused_attn_subblock.py).
    fused_attention: Any = False
    quant: str = "none"  # see BertSelfAttention.quant

    @nn.compact
    def __call__(self, x, attn_bias, deterministic: bool = True):
        from ..ops.int8_linear import dense_or_int8
        from .peft import HoulsbyAdapter

        d = x.shape[-1]
        if (self.fused_attention in ("subblock", "subblock_v2")
                and self.lora_rank == 0 and self.quant == "none"):
            # qkv proj + masked MHA + out proj in ONE Pallas call —
            # see ViTBlock and ops/fused_attn_subblock.py.  Param tree is
            # identical to the module path (_ProjParams); off-TPU the op
            # falls back to the identical-math XLA formulation.
            import functools

            from ..ops.fused_attn_subblock import (_reference_subblock,
                                                   fused_attn_subblock,
                                                   fused_attn_subblock_v2)
            from .vit import _ProjParams, _SubblockProj

            op = fused_attn_subblock if self.fused_attention == "subblock" \
                else functools.partial(fused_attn_subblock_v2, group_size=4)
            wqkv, bqkv = _SubblockProj(d, name="attention")()
            wo, bo = _ProjParams(d, d, name="attention_output")()
            wqkv, wo = wqkv.astype(self.dtype), wo.astype(self.dtype)
            b, t = x.shape[0], x.shape[1]
            key_bias = attn_bias.reshape(b, t)  # additive 0 / -1e9
            train = self.dropout > 0.0 and not deterministic
            if jax.default_backend() == "tpu" and not self.is_initializing():
                attn = op(
                    x, wqkv, bqkv, wo, bo, self.num_heads,
                    key_bias=key_bias, drop_rate=self.dropout,
                    dropout_rng=self.make_rng("dropout") if train else None)
            else:
                # Off-TPU / init: identical-math XLA formulation; train-
                # mode dropout uses XLA bernoulli (stochastic draws only
                # differ from the kernel's on-chip PRNG).
                rng = self.make_rng("dropout") if (
                    train and not self.is_initializing()) else None
                attn = _reference_subblock(
                    x, wqkv, bqkv, wo, bo, key_bias, self.num_heads,
                    self.dtype, drop_rate=self.dropout, dropout_rng=rng)
        else:
            attn = BertSelfAttention(self.num_heads, self.dtype,
                                     self.dropout, self.lora_rank,
                                     fused=self.fused_attention,
                                     quant=self.quant,
                                     name="attention")(
                x, attn_bias, deterministic)
            attn = dense_or_int8(d, self.dtype, "attention_output",
                                 self.quant)(attn)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        if self.houlsby_down > 0:
            # BertAdaptedSelfOutput: dense -> dropout -> adapter -> LN(+res)
            attn = HoulsbyAdapter(self.houlsby_down, self.adapter_activation,
                                  self.dtype, name="attention_adapter")(attn)
        x = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32,
                         name="attention_layernorm")(
            (x + attn).astype(jnp.float32)).astype(self.dtype)
        from .vit import _tag_mlp_hidden

        h = dense_or_int8(self.intermediate_dim, self.dtype,
                          "intermediate", self.quant)(x)
        h = _tag_mlp_hidden(h)  # pre-GELU: the "mlp" remat save point
        h = nn.gelu(h, approximate=False)
        h = dense_or_int8(d, self.dtype, "output", self.quant)(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        if self.houlsby_down > 0:
            h = HoulsbyAdapter(self.houlsby_down, self.adapter_activation,
                               self.dtype, name="output_adapter")(h)
        x = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32,
                         name="output_layernorm")(
            (x + h).astype(jnp.float32)).astype(self.dtype)
        return x


class BertEncoder(nn.Module):
    """BERT-base geometry by default; returns (last_hidden, all_hidden).

    all_hidden: (num_layers+1, B, T, D) - HF hidden_states order
    (embeddings output first).
    """

    vocab_size: int = 30522
    hidden_dim: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_dim: int = 3072
    max_position: int = 512
    type_vocab_size: int = 2
    dtype: Any = jnp.float32
    dropout: float = 0.1
    lora_rank: int = 0
    houlsby_down: int = 0
    adapter_activation: str = "RELU"
    # jax.checkpoint each layer: recompute activations in backward instead
    # of storing them - frees HBM for bigger uncached batches.
    # False | True (recompute everything) | "mlp" (full remat except the
    # stored pre-GELU MLP hidden - see models/vit.py:_remat_policy).
    remat: Any = False
    # Fused Pallas attention (see BertSelfAttention.fused).
    fused_attention: Any = False
    # "full" | "cls" | "mean" - see ViTEncoder.collect; "mean" stacks the
    # attention-masked per-layer token mean (the Versa mean-pool cache
    # semantics, preprocess_llama-3-70b_micro.py:67-70).
    collect: str = "full"
    quant: str = "none"  # see BertSelfAttention.quant

    @nn.compact
    def __call__(self, input_ids, attention_mask, deterministic: bool = True):
        b, t = input_ids.shape
        word = nn.Embed(self.vocab_size, self.hidden_dim,
                        dtype=self.dtype, name="word_embeddings")(input_ids)
        pos = self.param("position_embeddings", nn.initializers.normal(0.02),
                         (self.max_position, self.hidden_dim))
        tok_type = self.param("token_type_embeddings",
                              nn.initializers.normal(0.02),
                              (self.type_vocab_size, self.hidden_dim))
        x = word + pos[None, :t, :].astype(self.dtype) \
            + tok_type[0][None, None, :].astype(self.dtype)
        x = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32,
                         name="embeddings_layernorm")(
            x.astype(jnp.float32)).astype(self.dtype)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)

        # additive attention bias from the padding mask (HF convention:
        # (1-mask) * large negative added to logits)
        bias = (1.0 - attention_mask.astype(jnp.float32))[:, None, None, :] * -1e9

        from .vit import _remat_policy

        layer_cls = nn.remat(BertLayer, static_argnums=(3,),
                             policy=_remat_policy(self.remat)) \
            if self.remat else BertLayer
        if self.collect == "cls":
            reduce = lambda h: h[:, 0, :]
        elif self.collect == "mean":
            w = attention_mask.astype(jnp.float32)[:, :, None]
            denom = jnp.maximum(jnp.sum(w, axis=1), 1.0)
            reduce = lambda h: (jnp.sum(h.astype(jnp.float32) * w, axis=1)
                                / denom).astype(h.dtype)
        else:
            reduce = lambda h: h
        hiddens = [reduce(x)]
        for i in range(self.num_layers):
            x = layer_cls(self.num_heads, self.intermediate_dim,
                          self.dtype, self.dropout, self.lora_rank,
                          self.houlsby_down, self.adapter_activation,
                          self.fused_attention, self.quant,
                          name=f"layer_{i}")(x, bias, deterministic)
            hiddens.append(reduce(x))
        return x, jnp.stack(hiddens, axis=0)


def params_from_hf_torch(state_dict, num_layers: int = 12, lora: bool = False):
    """Map a transformers BertModel state_dict onto BertEncoder params.

    ``lora=True`` nests q/v under the LoRADense "base" sublayer (the LoRA
    A/B factors themselves are freshly initialized by model.init and should
    be grafted from an init tree)."""

    def t(name):
        return np.asarray(state_dict[name].detach().cpu().numpy())

    def lin(prefix):
        return {"kernel": t(prefix + ".weight").T, "bias": t(prefix + ".bias")}

    def qv(prefix):
        return {"base": lin(prefix)} if lora else lin(prefix)

    def ln(prefix):
        return {"scale": t(prefix + ".weight"), "bias": t(prefix + ".bias")}

    p = {
        "word_embeddings": {"embedding": t("embeddings.word_embeddings.weight")},
        "position_embeddings": t("embeddings.position_embeddings.weight"),
        "token_type_embeddings": t("embeddings.token_type_embeddings.weight"),
        "embeddings_layernorm": ln("embeddings.LayerNorm"),
    }
    for i in range(num_layers):
        e = f"encoder.layer.{i}"
        p[f"layer_{i}"] = {
            "attention": {
                "query": qv(f"{e}.attention.self.query"),
                "key": lin(f"{e}.attention.self.key"),
                "value": qv(f"{e}.attention.self.value"),
            },
            "attention_output": lin(f"{e}.attention.output.dense"),
            "attention_layernorm": ln(f"{e}.attention.output.LayerNorm"),
            "intermediate": lin(f"{e}.intermediate.dense"),
            "output": lin(f"{e}.output.dense"),
            "output_layernorm": ln(f"{e}.output.LayerNorm"),
        }
    return jax.tree_util.tree_map(jnp.asarray, p)
