"""VGG-style classifier with a 1x1-conv residual on the last block.

Capability-parity rebuild of reference src/model.py:92-202 (~8.15M params):
four 3-conv blocks (64, 128, 256, 512) of bias-free Conv->BN->GELU; block 1
downsamples with a stride-2 conv, blocks 2-3 with ceil-mode max pooling;
block 4 adds a 1x1-conv+BN residual from 256->512 (src/model.py:150-153,
197-198); bias-free scalar MLP and classifier. Flax/NHWC/bf16.
"""
from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from tpu_breath.models.layers import (ConvBlock, MLPBlock, max_pool_2x2,
                                      global_avg_pool, he_normal,
                                      xavier_uniform)


class VGG(nn.Module):
    num_scalar_features: int = 36
    dropout_rate: float = 0.2
    dtype: type = jnp.bfloat16

    def _block(self, x, width, train, n_convs=3, stride_last=1):
        for i in range(n_convs):
            stride = stride_last if i == n_convs - 1 else 1
            x = ConvBlock(width, strides=stride, order="bn_gelu",
                          use_bias=False, dtype=self.dtype)(x, train)
        return x

    @nn.compact
    def __call__(self, features, scalars, train: bool = False):
        """features [B, C, H, W], scalars [B, S] -> logits [B]."""
        d = self.dropout_rate
        x = jnp.transpose(features, (0, 2, 3, 1)).astype(self.dtype)  # NHWC

        x = self._block(x, 64, train, stride_last=2)
        x = nn.Dropout(d * 0.5, broadcast_dims=(1, 2),
                       deterministic=not train)(x)

        x = self._block(x, 128, train)
        x = max_pool_2x2(x, ceil_mode=True)
        x = nn.Dropout(d, broadcast_dims=(1, 2), deterministic=not train)(x)

        x = self._block(x, 256, train)
        x = max_pool_2x2(x, ceil_mode=True)
        x = nn.Dropout(d, broadcast_dims=(1, 2), deterministic=not train)(x)

        # block 4 + 1x1-conv residual (src/model.py:150-153,197-198)
        residual = nn.Conv(512, (1, 1), use_bias=False, kernel_init=he_normal,
                           dtype=self.dtype, param_dtype=jnp.float32)(x)
        residual = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=jnp.float32,
                                param_dtype=jnp.float32)(residual)
        main = self._block(x, 512, train)
        main = nn.Dropout(d, broadcast_dims=(1, 2),
                          deterministic=not train)(main)
        x = main.astype(jnp.float32) + residual
        x = global_avg_pool(x.astype(self.dtype))

        s = scalars.astype(self.dtype)
        s = MLPBlock(64, order="bn_gelu", dropout=d, use_bias=False,
                     dtype=self.dtype)(s, train)
        s = MLPBlock(64, order="bn_gelu", use_bias=False,
                     dtype=self.dtype)(s, train)

        z = jnp.concatenate([x, s], axis=-1)
        z = MLPBlock(256, order="bn_gelu", dropout=d, use_bias=False,
                     dtype=self.dtype)(z, train)
        z = MLPBlock(128, order="bn_gelu", dropout=d, use_bias=False,
                     dtype=self.dtype)(z, train)
        logit = nn.Dense(1, kernel_init=xavier_uniform, dtype=jnp.float32,
                         param_dtype=jnp.float32)(z.astype(jnp.float32))
        return jnp.squeeze(logit, -1)
