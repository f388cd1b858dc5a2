"""Flax ViT encoder with per-layer hidden-state taps.

TPU-native replacement for the HF torch ``ViTForImageClassification`` tower
the reference loads frozen (/root/reference/Code_Cached/run.py:41-49) and
runs with ``output_hidden_states=True`` (encoders.py:23-25); the cache
builder stacks the CLS of each of the 13 hidden states
(preprocess_vectors.py:96-103).

ViT-base/16 semantics: conv patch embedding (16x16/16), prepended CLS token,
learned position embeddings, pre-LN blocks (LN -> MHA -> residual,
LN -> MLP(gelu) -> residual), final LayerNorm applied only to the last
hidden state.  HF ``hidden_states`` entries are the raw (pre-final-LN) block
outputs with the embedding output first - reproduced exactly, since those
are what the SAN fuses.

The patchify conv is expressed as reshape + one (N*196, 768)x(768, D)
matmul - on TPU that lands on the MXU directly instead of relying on conv
lowering.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class ViTSelfAttention(nn.Module):
    num_heads: int
    dtype: Any = jnp.float32
    dropout: float = 0.0
    lora_rank: int = 0  # LoRA on q/v (run.py:168-171 analog)
    # Fused Pallas attention (ops/fused_attention.py): scores never touch
    # HBM, forward AND backward (the bwd is a recompute kernel that
    # replays the on-chip dropout PRNG), so both frozen-tower IISAN and
    # the tower-training methods (FFT/LoRA/Houlsby/BitFit) qualify.  HF
    # ViT-base has attention dropout 0.0; a tower_dropout override > 0
    # routes through the kernel's train mode like BERT.
    fused: bool = False
    # "int8": W8A8 projections on the MXU (ops/int8_linear.py) — frozen
    # towers only (config.validate gates on towers_frozen()).
    quant: str = "none"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
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
                rng = None
                if not deterministic and self.dropout > 0.0:
                    rng = self.make_rng("dropout")
                return fused_mha(q, k, v, self.num_heads,
                                 drop_rate=self.dropout, dropout_rng=rng)

        def split(y):
            return y.reshape(b, t, self.num_heads, dh).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) / math.sqrt(dh)
        p = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        p = nn.Dropout(self.dropout)(p, deterministic=deterministic)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v,
                       preferred_element_type=jnp.float32).astype(self.dtype)
        return o.transpose(0, 2, 1, 3).reshape(b, t, d)


def _remat_policy(remat):
    """jax.checkpoint policy for a remat mode: True -> None (recompute
    everything); "mlp" -> full remat EXCEPT the tensor tagged
    ``mlp_hidden`` (the pre-GELU (B, T, 4D) MLP hidden) which is stored:
    the backward then skips the MLP-up GEMM recompute (~1/3 of a layer's
    forward FLOPs) and feeds GELU's VJP directly, for ~0.4 GB/layer of
    extra storage at the uncached ViT geometry.  The inverse policy
    (save everything but the MLP hiddens) was measured first and OOM'd
    a 16 GB v5e on the FFT step — FFT_ATTN_AB.json."""
    if remat == "mlp":
        return jax.checkpoint_policies.save_only_these_names("mlp_hidden")
    return None


def _tag_mlp_hidden(h):
    """checkpoint_name tag consumed by the "mlp" remat policy."""
    from jax.ad_checkpoint import checkpoint_name

    return checkpoint_name(h, "mlp_hidden")


class _ProjParams(nn.Module):
    """Parameter container with nn.Dense's exact tree ({kernel, bias}),
    shapes and initializers — but no GEMM.  Lets the fused subblock path
    declare the q/k/v/output-projection weights under the SAME param
    paths the module path uses (attention/{query,key,value},
    attention_output), so checkpoints, HF import and PEFT masks are
    layout-independent of the attention implementation."""

    in_dim: int
    features: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.in_dim, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class _SubblockProj(nn.Module):
    """Declares query/key/value projection params (module-path layout)
    and returns them concatenated for ops/fused_attn_subblock."""

    dim: int

    @nn.compact
    def __call__(self):
        wq, bq = _ProjParams(self.dim, self.dim, name="query")()
        wk, bk = _ProjParams(self.dim, self.dim, name="key")()
        wv, bv = _ProjParams(self.dim, self.dim, name="value")()
        return (jnp.concatenate([wq, wk, wv], axis=1),
                jnp.concatenate([bq, bk, bv], axis=0))


class ViTBlock(nn.Module):
    num_heads: int
    intermediate_dim: int
    dtype: Any = jnp.float32
    dropout: float = 0.0
    lora_rank: int = 0
    houlsby_down: int = 0   # VITAdaptedSelfOutput/VITAdaptedOutput analog
    adapter_activation: str = "RELU"
    # False | True (fused_mha) | "subblock" | "subblock_v2" (one Pallas
    # call for qkv proj + MHA + out proj, ops/fused_attn_subblock.py;
    # v2 puts head-groups on the grid).
    fused_attention: Any = False
    quant: str = "none"  # see ViTSelfAttention.quant

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        from ..ops.int8_linear import dense_or_int8
        from .peft import HoulsbyAdapter

        d = x.shape[-1]
        h = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32,
                         name="layernorm_before")(
            x.astype(jnp.float32)).astype(self.dtype)
        if (self.fused_attention in ("subblock", "subblock_v2")
                and self.lora_rank == 0 and self.quant == "none"):
            # One Pallas call for qkv proj + MHA + out proj (two
            # XLA<->Pallas crossings per block instead of five) — see
            # ops/fused_attn_subblock.py.  Static branch: param creation
            # is identical across init/apply; off-TPU the op itself
            # falls back to the identical-math XLA formulation.
            import functools

            from ..ops.fused_attn_subblock import (_reference_subblock,
                                                   fused_attn_subblock,
                                                   fused_attn_subblock_v2)

            op = fused_attn_subblock if self.fused_attention == "subblock" \
                else functools.partial(fused_attn_subblock_v2, group_size=4)
            wqkv, bqkv = _SubblockProj(d, name="attention")()
            wo, bo = _ProjParams(d, d, name="attention_output")()
            wqkv, wo = wqkv.astype(self.dtype), wo.astype(self.dtype)
            train = self.dropout > 0.0 and not deterministic
            if jax.default_backend() == "tpu" and not self.is_initializing():
                h = op(
                    h, wqkv, bqkv, wo, bo, self.num_heads,
                    drop_rate=self.dropout,
                    dropout_rng=self.make_rng("dropout") if train else None)
            else:
                # Off-TPU / init: identical-math XLA formulation; train-
                # mode dropout uses XLA bernoulli (stochastic draws only
                # differ from the kernel's on-chip PRNG).
                rng = self.make_rng("dropout") if (
                    train and not self.is_initializing()) else None
                h = _reference_subblock(
                    h, wqkv, bqkv, wo, bo, None, self.num_heads,
                    self.dtype, drop_rate=self.dropout, dropout_rng=rng)
        else:
            h = ViTSelfAttention(self.num_heads, self.dtype, self.dropout,
                                 self.lora_rank, fused=self.fused_attention,
                                 quant=self.quant,
                                 name="attention")(h, deterministic)
            h = dense_or_int8(d, self.dtype, "attention_output",
                              self.quant)(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        if self.houlsby_down > 0:
            # VITAdaptedSelfOutput: dense -> dropout -> adapter (model.py:225-238)
            h = HoulsbyAdapter(self.houlsby_down, self.adapter_activation,
                               self.dtype, name="attention_adapter")(h)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32,
                         name="layernorm_after")(
            x.astype(jnp.float32)).astype(self.dtype)
        h = dense_or_int8(self.intermediate_dim, self.dtype,
                          "intermediate", self.quant)(h)
        h = _tag_mlp_hidden(h)  # pre-GELU: the "mlp" remat save point
        h = nn.gelu(h, approximate=False)
        h = dense_or_int8(d, self.dtype, "output", self.quant)(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        if self.houlsby_down > 0:
            # VITAdaptedOutput: dense -> dropout -> adapter -> +input
            h = HoulsbyAdapter(self.houlsby_down, self.adapter_activation,
                               self.dtype, name="output_adapter")(h)
        return x + h


class ViTEncoder(nn.Module):
    """ViT-base/16 geometry by default; returns (pooled_last, all_hidden).

    Input images: (B, H, W, 3) channels-last, already resized/normalized
    (the +-0.5 normalization of dataset.py:54-59 happens in the host
    pipeline).  all_hidden: (num_layers+1, B, 197, D), HF hidden_states
    order (pre-final-LN block outputs).  pooled_last is the final-LN'd last
    hidden state - what HF feeds the classifier head.
    """

    image_size: int = 224
    patch_size: int = 16
    hidden_dim: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_dim: int = 3072
    dtype: Any = jnp.float32
    dropout: float = 0.0
    lora_rank: int = 0
    houlsby_down: int = 0
    adapter_activation: str = "RELU"
    # Rematerialization of each block in the backward (see
    # BertEncoder.remat): False | True (recompute everything) | "mlp"
    # (full remat except the pre-GELU MLP hidden, which is stored so the
    # backward skips the MLP-up GEMM recompute - see _remat_policy).
    remat: Any = False
    # Fused Pallas attention: False | True | "subblock" (see ViTBlock).
    fused_attention: Any = False
    # Per-layer hidden-state collection: "full" stacks the whole (B, T, D)
    # activation per layer (HF output_hidden_states parity - what the
    # cache builder and parity tests consume); "cls" stacks only the CLS
    # row.  The SAN taps only need CLS, and stacking full states costs
    # ~75 ms/step of pure dynamic-update-slice traffic at the uncached
    # training geometry (104 MB per stack) - 35% of the step.
    collect: str = "full"
    quant: str = "none"  # see ViTSelfAttention.quant

    @nn.compact
    def __call__(self, images, deterministic: bool = True):
        from ..ops.int8_linear import dense_or_int8

        b = images.shape[0]
        p = self.patch_size
        n = self.image_size // p  # 14
        # Patchify as reshape+matmul: (B, n, p, n, p, 3) -> (B, n*n, p*p*3).
        x = images.astype(self.dtype).reshape(b, n, p, n, p, 3)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, n * n, p * p * 3)
        x = dense_or_int8(self.hidden_dim, self.dtype,
                          "patch_projection", self.quant)(x)
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, self.hidden_dim))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype), (b, 1, self.hidden_dim)), x],
            axis=1)  # (B, 197, D)
        pos = self.param("position_embeddings", nn.initializers.normal(0.02),
                         (1, n * n + 1, self.hidden_dim))
        x = x + pos.astype(self.dtype)

        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        layer_cls = nn.remat(ViTBlock, static_argnums=(2,),
                             policy=_remat_policy(self.remat)) \
            if self.remat else ViTBlock
        reduce = (lambda h: h[:, 0, :]) if self.collect == "cls" \
            else (lambda h: h)
        hiddens = [reduce(x)]
        for i in range(self.num_layers):
            x = layer_cls(self.num_heads, self.intermediate_dim,
                          self.dtype, self.dropout, self.lora_rank,
                          self.houlsby_down, self.adapter_activation,
                          self.fused_attention, self.quant,
                          name=f"layer_{i}")(x, deterministic)
            hiddens.append(reduce(x))
        last = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32,
                            name="final_layernorm")(
            x.astype(jnp.float32)).astype(self.dtype)
        return last, jnp.stack(hiddens, axis=0)


def params_from_hf_torch(state_dict, num_layers: int = 12,
                         prefix: str = "vit.", lora: bool = False):
    """Map a transformers ViTModel/ViTForImageClassification state_dict onto
    ViTEncoder params (HF conv patch kernel (D,3,p,p) -> dense (p*p*3, D))."""

    def t(name):
        return np.asarray(state_dict[prefix + name].detach().cpu().numpy())

    def lin(name):
        return {"kernel": t(name + ".weight").T, "bias": t(name + ".bias")}

    def qv(name):
        return {"base": lin(name)} if lora else lin(name)

    def ln(name):
        return {"scale": t(name + ".weight"), "bias": t(name + ".bias")}

    conv_w = t("embeddings.patch_embeddings.projection.weight")  # (D,3,p,p)
    d, c, p1, p2 = conv_w.shape
    # Our patch vector layout is (p, p, 3) flattened row-major.
    kernel = conv_w.transpose(2, 3, 1, 0).reshape(p1 * p2 * c, d)
    params = {
        "patch_projection": {
            "kernel": kernel,
            "bias": t("embeddings.patch_embeddings.projection.bias"),
        },
        "cls_token": t("embeddings.cls_token"),
        "position_embeddings": t("embeddings.position_embeddings"),
        "final_layernorm": ln("layernorm"),
    }
    for i in range(num_layers):
        e = f"encoder.layer.{i}"
        params[f"layer_{i}"] = {
            "layernorm_before": ln(f"{e}.layernorm_before"),
            "attention": {
                "query": qv(f"{e}.attention.attention.query"),
                "key": lin(f"{e}.attention.attention.key"),
                "value": qv(f"{e}.attention.attention.value"),
            },
            "attention_output": lin(f"{e}.attention.output.dense"),
            "layernorm_after": ln(f"{e}.layernorm_after"),
            "intermediate": lin(f"{e}.intermediate.dense"),
            "output": lin(f"{e}.output.dense"),
        }
    return jax.tree_util.tree_map(jnp.asarray, params)
