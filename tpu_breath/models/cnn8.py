"""CNN8: 8-conv audio classifier with a scalar-descriptor side branch.

Capability-parity rebuild of reference src/model.py:5-89 (~2.43M params):
conv widths 32-64-128-128-256x4 with Conv->ReLU->BN, MaxPool after convs 2
and 4, channel dropout after conv 4, global average pooling; scalar MLP
S->64->64; classifier (256+64)->256->128->1. Flax/NHWC/bf16 (see
models/layers.py for the layout + mixed-precision conventions).
"""
from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from tpu_breath.models.layers import (ConvBlock, MLPBlock, max_pool_2x2,
                                      global_avg_pool, xavier_uniform)


class CNN8(nn.Module):
    num_scalar_features: int = 36
    dropout_rate: float = 0.3
    dtype: type = jnp.bfloat16

    @nn.compact
    def __call__(self, features, scalars, train: bool = False):
        """features [B, C, H, W] (reference layout), scalars [B, S] -> logits [B]."""
        x = jnp.transpose(features, (0, 2, 3, 1)).astype(self.dtype)  # NHWC
        for i, (width, pool, drop) in enumerate([
                (32, False, False), (64, True, False),
                (128, False, False), (128, True, True),
                (256, False, False), (256, False, False),
                (256, False, False), (256, False, False)]):
            x = ConvBlock(width, order="relu_bn", dtype=self.dtype)(x, train)
            if pool:
                x = max_pool_2x2(x)
            if drop:
                x = nn.Dropout(self.dropout_rate, broadcast_dims=(1, 2),
                               deterministic=not train)(x)
        x = global_avg_pool(x)

        s = scalars.astype(self.dtype)
        s = MLPBlock(64, order="relu_bn", dropout=self.dropout_rate,
                     dtype=self.dtype)(s, train)
        s = MLPBlock(64, order="relu_bn", dtype=self.dtype)(s, train)

        z = jnp.concatenate([x, s], axis=-1)
        z = MLPBlock(256, order="relu_bn", dropout=self.dropout_rate,
                     dtype=self.dtype)(z, train)
        z = MLPBlock(128, order="relu_bn", dtype=self.dtype)(z, train)
        logit = nn.Dense(1, kernel_init=xavier_uniform, dtype=jnp.float32,
                         param_dtype=jnp.float32)(z.astype(jnp.float32))
        return jnp.squeeze(logit, -1)
