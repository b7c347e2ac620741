"""Shared Flax building blocks for the model zoo.

Conventions (TPU-native, differing deliberately from the reference's torch
habits):
- NHWC activation layout (XLA:TPU's native conv layout); the public forward
  accepts the reference's [B, C, H, W] contract and transposes once at entry.
- bf16 activations with f32 params and f32 BatchNorm statistics — the TPU
  equivalent of the reference's CUDA AMP autocast (src/train.py:53,92); bf16
  has f32's exponent range so no GradScaler analogue is needed.
- Explicit (1,1) conv padding (not SAME) so strided convs produce exactly the
  reference's output sizes on odd inputs (src/model.py:103).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

Dtype = Any

he_normal = nn.initializers.variance_scaling(2.0, "fan_in", "normal")
xavier_uniform = nn.initializers.xavier_uniform()


class ConvBlock(nn.Module):
    """Conv3x3 (+optional stride) -> activation/BN in the given order.

    order="relu_bn" reproduces CNN8's Conv->ReLU->BN (src/model.py:10-12);
    order="bn_gelu" reproduces VGG's Conv->BN->GELU (src/model.py:97-99).
    """

    features: int
    strides: int = 1
    order: str = "relu_bn"
    use_bias: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(self.features, (3, 3), strides=(self.strides, self.strides),
                    padding=((1, 1), (1, 1)), use_bias=self.use_bias,
                    kernel_init=he_normal, dtype=self.dtype,
                    param_dtype=jnp.float32)(x)
        bn = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                          epsilon=1e-5, dtype=jnp.float32,
                          param_dtype=jnp.float32)
        if self.order == "relu_bn":
            x = nn.relu(x)
            x = bn(x)
        elif self.order == "bn_gelu":
            x = bn(x)
            x = nn.gelu(x, approximate=False)
        else:
            raise ValueError(self.order)
        return x.astype(self.dtype)


def max_pool_2x2(x: jax.Array, ceil_mode: bool = False) -> jax.Array:
    """2x2/stride-2 max pool on NHWC; ceil_mode pads the tail like torch's
    MaxPool2d(ceil_mode=True) (src/model.py:119,133)."""
    if ceil_mode:
        ph, pw = x.shape[1] % 2, x.shape[2] % 2
        if ph or pw:
            neg = jnp.finfo(x.dtype).min if jnp.issubdtype(x.dtype, jnp.floating) else x.min()
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)),
                        constant_values=neg)
    return nn.max_pool(x, (2, 2), strides=(2, 2), padding="VALID")


def global_avg_pool(x: jax.Array) -> jax.Array:
    """AdaptiveAvgPool2d((1,1)) + flatten on NHWC -> [B, C]."""
    return jnp.mean(x, axis=(1, 2))


class MLPBlock(nn.Module):
    """Linear -> (ReLU->BN | BN->GELU) -> optional Dropout, matching the
    reference's scalar/classifier stacks (src/model.py:47-69,157-177)."""

    features: int
    order: str = "relu_bn"
    dropout: float = 0.0
    use_bias: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Dense(self.features, use_bias=self.use_bias,
                     kernel_init=xavier_uniform, dtype=self.dtype,
                     param_dtype=jnp.float32)(x)
        bn = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                          epsilon=1e-5, dtype=jnp.float32,
                          param_dtype=jnp.float32)
        if self.order == "relu_bn":
            x = nn.relu(x)
            x = bn(x)
        elif self.order == "bn_gelu":
            x = bn(x)
            x = nn.gelu(x, approximate=False)
        else:
            raise ValueError(self.order)
        x = x.astype(self.dtype)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x
