"""PEFT building blocks: LoRA linear and Houlsby insertion points.

The reference implements its PEFT baselines by monkey-patching HF modules
(/root/reference/Code_Uncached/run.py:186-260): ``loralib.Linear`` swapped
into q/v projections, ``BertAdaptedSelfOutput``/``VITAdaptedSelfOutput``/
``VITAdaptedOutput`` wrappers for Houlsby adapters
(Code_Uncached/model/model.py:198-254), BitFit as requires_grad on biases.
Here the same capabilities are first-class tower options (``lora_rank``,
``houlsby_down`` fields on the encoders) and BitFit/FFT are optimizer
trainability masks (train/peft_masks.py).

NOTE a reference quirk we deliberately correct: run.py:170-176 *replaces*
the pretrained q/v projections with freshly initialized lora.Linear modules,
discarding the pretrained weights.  We implement standard LoRA (frozen
pretrained base + zero-init low-rank delta, scaling 1/r like loralib's
default lora_alpha=1), which is the method the baseline is named after.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def lora_a_init(key, shape, dtype=jnp.float32):
    """loralib default: kaiming_uniform(a=sqrt(5)) on the (r, in) matrix;
    our layout is (in, r), so bound uses fan_in = in-features."""
    bound = math.sqrt(6.0 / shape[0])
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


class LoRADense(nn.Module):
    """Dense layer with optional low-rank adaptation delta.

    y = x W + b + (x A) B * (1/r).  A/B exist only when rank > 0; B is
    zero-init so the delta starts at exactly 0.
    """

    features: int
    rank: int = 0
    dtype: Any = jnp.float32
    name_base: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        y = nn.Dense(self.features, dtype=self.dtype, name="base")(x)
        if self.rank > 0:
            a = self.param("lora_A", lora_a_init, (x.shape[-1], self.rank))
            b = self.param("lora_B", nn.initializers.zeros,
                           (self.rank, self.features))
            delta = jnp.dot(jnp.dot(x, a.astype(x.dtype)), b.astype(x.dtype))
            y = y + delta * (1.0 / self.rank)
        return y


class HoulsbyAdapter(nn.Module):
    """Serial bottleneck adapter used by the Houlsby baseline - same math
    as AdapterBlock (modules.py:98-117) but placed inside tower blocks."""

    down_size: int
    activation: str = "RELU"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        h = nn.Dense(self.down_size, dtype=self.dtype,
                     kernel_init=nn.initializers.normal(1e-2),
                     bias_init=nn.initializers.zeros, name="fc_down")(x)
        h = nn.gelu(h, approximate=False) if self.activation == "GELU" \
            else nn.relu(h)
        h = nn.Dense(d, dtype=self.dtype,
                     kernel_init=nn.initializers.normal(1e-2),
                     bias_init=nn.initializers.zeros, name="fc_up")(h)
        return h + x
