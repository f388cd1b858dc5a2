"""Core Flax NN primitives for the TPU-native IISAN framework.

Semantics-equivalent rebuilds of the reference's from-scratch transformer
primitives (/root/reference/Code_Cached/model/modules.py:1-117), written as
flax.linen modules with TPU-friendly dtypes: parameters live in fp32 and
activations run in a configurable compute dtype (bf16 by default) so XLA
keeps matmuls on the MXU without a loss-scaler (the reference instead uses
torch.cuda.amp, Code_Cached/run.py:380-385).

Initializer parity: torch ``nn.Linear`` defaults to Kaiming-uniform weights
and uniform(+-1/sqrt(fan_in)) bias, the SASRec user encoder re-initializes
every Linear/Embedding with xavier_normal + zero bias
(Code_Cached/model/encoders.py:45-51), and AdapterBlock uses N(0, 1e-2)
weights with zero bias (modules.py:102-110).  All three are provided here.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """torch.nn.Linear default: kaiming_uniform(a=sqrt(5)).

    For a weight of shape (fan_in, fan_out) (flax convention; torch stores
    the transpose) this is U(-1/sqrt(fan_in), 1/sqrt(fan_in)).
    """
    fan_in = shape[0]
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def torch_linear_bias_init(fan_in: int):
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


xavier_normal_init = nn.initializers.xavier_normal()
adapter_kernel_init = nn.initializers.normal(stddev=1e-2)


class TorchLinear(nn.Module):
    """Dense layer with torch-default initialization (see module docstring)."""

    features: int
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    kernel_init: Optional[Callable] = None
    bias_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        kernel_init = self.kernel_init or torch_linear_kernel_init
        kernel = self.param("kernel", kernel_init, (fan_in, self.features))
        dtype = self.dtype or x.dtype
        y = jnp.dot(x.astype(dtype), kernel.astype(dtype))
        if self.use_bias:
            bias_init = self.bias_init or torch_linear_bias_init(fan_in)
            bias = self.param("bias", bias_init, (self.features,))
            y = y + bias.astype(dtype)
        return y


class XavierLinear(nn.Module):
    """Dense layer with xavier_normal weights / zero bias.

    Matches User_Encoder._init_weights (Code_Cached/model/encoders.py:45-51)
    and the re-initialized ViT classifier head (Code_Cached/run.py:46-49).
    """

    features: int
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        kernel = self.param("kernel", xavier_normal_init, (fan_in, self.features))
        dtype = self.dtype or x.dtype
        y = jnp.dot(x.astype(dtype), kernel.astype(dtype))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(dtype)
        return y


class AdapterBlock(nn.Module):
    """Bottleneck adapter: down-proj -> activation -> up-proj + residual.

    Reference: Code_Cached/model/modules.py:98-117.  Note the reference
    creates a Dropout submodule but never applies it in forward
    (modules.py:113-116); we reproduce that (no dropout) for parity.
    Weight init N(0, 1e-2), bias zeros (modules.py:102-110).
    """

    down_size: int
    activation: str = "RELU"  # "GELU" or anything-else==ReLU (modules.py:104)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        features = x.shape[-1]
        dtype = self.dtype or x.dtype
        down = TorchLinear(
            self.down_size,
            dtype=dtype,
            kernel_init=adapter_kernel_init,
            bias_init=nn.initializers.zeros,
            name="fc_down",
        )(x)
        if self.activation == "GELU":
            h = nn.gelu(down, approximate=False)
        else:
            h = nn.relu(down)
        up = TorchLinear(
            features,
            dtype=dtype,
            kernel_init=adapter_kernel_init,
            bias_init=nn.initializers.zeros,
            name="fc_up",
        )(h)
        return up + x


class MultiHeadedAttention(nn.Module):
    """Post-LN multi-head self-attention (Code_Cached/model/modules.py:35-64).

    Q/K/V/out projections carry no bias; an additive mask (0 / -1e9) is added
    to the scaled logits; attention probabilities are dropped out; the output
    projection is dropped out and LayerNorm(residual + x) applied (post-LN).
    """

    n_heads: int
    dropout: float
    dtype: Optional[Dtype] = None
    linear_cls: Any = XavierLinear  # SASRec re-init makes these xavier

    @nn.compact
    def __call__(self, x, additive_mask, deterministic: bool = True):
        d_model = x.shape[-1]
        d_k = d_model // self.n_heads
        dtype = self.dtype or x.dtype
        residual = x

        def heads(name):
            y = self.linear_cls(d_model, use_bias=False, dtype=dtype, name=name)(x)
            b, l = y.shape[0], y.shape[1]
            return y.reshape(b, l, self.n_heads, d_k).transpose(0, 2, 1, 3)

        q, k, v = heads("w_Q"), heads("w_K"), heads("w_V")
        # (b, h, l, l) logits in fp32 for a numerically stable softmax.
        attn = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) / math.sqrt(d_k)
        attn = attn + additive_mask.astype(jnp.float32)
        p = jax.nn.softmax(attn, axis=-1).astype(dtype)
        p = nn.Dropout(self.dropout)(p, deterministic=deterministic)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v, preferred_element_type=jnp.float32)
        o = o.astype(dtype).transpose(0, 2, 1, 3).reshape(x.shape)
        o = self.linear_cls(d_model, use_bias=False, dtype=dtype, name="fc")(o)
        o = nn.Dropout(self.dropout)(o, deterministic=deterministic)
        out = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="layer_norm")(
            (residual + o).astype(jnp.float32)
        )
        return out.astype(dtype)


class PositionwiseFeedForward(nn.Module):
    """Post-LN FFN: LN(residual + dropout(W2 relu(W1 x))).

    Reference: Code_Cached/model/modules.py:6-18.
    """

    d_inner: int
    dropout: float
    dtype: Optional[Dtype] = None
    linear_cls: Any = XavierLinear

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        d_model = x.shape[-1]
        dtype = self.dtype or x.dtype
        residual = x
        h = self.linear_cls(self.d_inner, dtype=dtype, name="w_1")(x)
        h = nn.relu(h)
        h = self.linear_cls(d_model, dtype=dtype, name="w_2")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        out = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="layer_norm")(
            (residual + h).astype(jnp.float32)
        )
        return out.astype(dtype)


class TransformerBlock(nn.Module):
    """MHA + FFN (Code_Cached/model/modules.py:67-76)."""

    n_heads: int
    d_inner: int
    dropout: float
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, additive_mask, deterministic: bool = True):
        x = MultiHeadedAttention(
            self.n_heads, self.dropout, dtype=self.dtype, name="multi_head_attention"
        )(x, additive_mask, deterministic)
        return PositionwiseFeedForward(
            self.d_inner, self.dropout, dtype=self.dtype, name="feed_forward"
        )(x, deterministic)


class TransformerEncoder(nn.Module):
    """Learned-positional post-LN encoder (Code_Cached/model/modules.py:79-96).

    output = blocks(dropout(LN(x + pos_emb)))
    """

    n_position: int
    n_heads: int
    n_layers: int
    dropout: float
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, input_embs, additive_mask, deterministic: bool = True):
        d_model = input_embs.shape[-1]
        dtype = self.dtype or input_embs.dtype
        pos_table = self.param(
            "position_embedding", xavier_normal_init, (self.n_position, d_model)
        )
        seq_len = input_embs.shape[1]
        x = input_embs + pos_table[None, :seq_len, :].astype(dtype)
        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="layer_norm")(
            x.astype(jnp.float32)
        ).astype(dtype)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        for i in range(self.n_layers):
            x = TransformerBlock(
                self.n_heads,
                d_model * 4,
                self.dropout,
                dtype=dtype,
                name=f"transformer_blocks_{i}",
            )(x, additive_mask, deterministic)
        return x
