"""PANNs-style CNN backbones (CNN8 / CNN12).

Parity: reference src/models/components/backbone.py:6-61 and
model_utilities.py ConvBlock (:92-126) — double conv(3x3, no bias) + BN + ReLU
with avg pooling (2,2)x3 then (1,2)s. CNN12 is the PANNs Cnn14 conv trunk, so
its converted checkpoints load the released Cnn14_mAP=0.431.pth weights.

Internally NHWC (TPU-native conv layout); callers pass NCHW (B, C, T, F) and
receive NCHW back to preserve the reference's interface.
"""

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .common import BatchNorm2d

Dtype = Any


class ConvBlock(nn.Module):
    out_channels: int
    pool_size: Tuple[int, int] = (2, 2)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """NHWC in/out."""
        x = nn.Conv(self.out_channels, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = BatchNorm2d(self.out_channels, dtype=self.dtype, name="bn1")(
            x, use_running_average=not train)
        x = nn.relu(x)
        x = nn.Conv(self.out_channels, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, name="conv2")(x)
        x = BatchNorm2d(self.out_channels, dtype=self.dtype, name="bn2")(
            x, use_running_average=not train)
        x = nn.relu(x)
        x = nn.avg_pool(x, self.pool_size, strides=self.pool_size)
        return x


class CNN(nn.Module):
    """CNN8 (4 blocks) / CNN12 (6 blocks) depending on len(num_features)."""

    num_features: Sequence[int] = (32, 64, 128, 256)
    dtype: Dtype = jnp.float32

    def setup(self):
        pools = [(2, 2), (2, 2), (2, 2)] + [(1, 2)] * (len(self.num_features) - 3)
        self.blocks = [
            ConvBlock(out_channels=self.num_features[i], pool_size=pools[i],
                      dtype=self.dtype, name=f"conv_block{i + 1}")
            for i in range(len(self.num_features))
        ]

    def run_block(self, i: int, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """NCHW in/out — per-block hook used by the EINV2 cross-stitch."""
        h = jnp.transpose(x, (0, 2, 3, 1))
        h = self.blocks[i](h, train)
        return jnp.transpose(h, (0, 3, 1, 2))

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """(B, C, T, F) -> (B, C', T', F')."""
        h = jnp.transpose(x, (0, 2, 3, 1))  # NHWC
        for blk in self.blocks:
            h = blk(h, train)
        return jnp.transpose(h, (0, 3, 1, 2))
