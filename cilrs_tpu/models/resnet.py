"""ResNet-34 visual encoder in Flax (NHWC, bf16-friendly).

Architecturally equivalent to the torchvision resnet34 trunk the reference uses
(reference model/autonomous_drive.py:365-370: conv1..layer4 + avgpool + flatten,
512-d output, ~21.3 M params), but laid out TPU-first: NHWC tensors, bfloat16
compute with float32 parameters/statistics, and no Python-level control flow so
the whole trunk compiles to one fused XLA program feeding the MXU.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, param_dtype=jnp.float32, name=name,
        )
        residual = x
        y = nn.Conv(self.features, (3, 3), strides=(self.strides, self.strides),
                    padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv1")(x)
        y = norm("bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv2")(y)
        y = norm("bn2")(y)
        if residual.shape[-1] != self.features or self.strides != 1:
            residual = nn.Conv(self.features, (1, 1), strides=(self.strides, self.strides),
                               use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                               name="downsample_conv")(residual)
            residual = norm("downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet34(nn.Module):
    """ResNet-34 trunk -> 512-d global feature. Input NHWC in [0, 1]-normalized space."""

    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    stage_features: Sequence[int] = (64, 128, 256, 512)
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, param_dtype=jnp.float32, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for stage, (num_blocks, feats) in enumerate(zip(self.stage_sizes, self.stage_features)):
            for block in range(num_blocks):
                strides = 2 if stage > 0 and block == 0 else 1
                x = BasicBlock(feats, strides=strides, dtype=self.dtype,
                               name=f"layer{stage + 1}_{block}")(x, train=train)
        x = jnp.mean(x, axis=(1, 2))  # global average pool -> [B, 512]
        return x.astype(jnp.float32)
