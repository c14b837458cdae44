"""Conformer blocks (decoder option for CNN backbones and EINV2 track decoders).

Parity: reference src/models/components/conformer/* (sooftware/conformer style) —
macaron half-step FFN · Transformer-XL relative MHSA with u/v biases and
_relative_shift · depthwise-conv module (pointwise→GLU→depthwise k=31→BN→SiLU→
pointwise) · half-step FFN · final LayerNorm (encoder.py:34-113,208-239).

All sequence convs run as NWC lax convs; the sinusoidal positional table is a
static constant of the (fixed) sequence length.
"""

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .common import TorchBatchNorm

Dtype = Any


def sinusoid_position_encoding(length: int, d_model: int) -> np.ndarray:
    pos = np.arange(length, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float64) * -(math.log(10000.0) / d_model))
    pe = np.zeros((length, d_model), np.float32)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe


class FeedForwardModule(nn.Module):
    dim: int
    expansion: int = 4
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        x = nn.Dense(self.dim * self.expansion, dtype=self.dtype, name="fc1")(x)
        x = nn.silu(x)
        if not deterministic and self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=False)(x)
        x = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(x)
        if not deterministic and self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=False)(x)
        return x


class RelativeMultiHeadAttention(nn.Module):
    """Transformer-XL style relative MHSA (reference attention.py:28-117)."""

    d_model: int
    num_heads: int
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos_emb, deterministic: bool = True):
        B, T, _ = x.shape
        H = self.num_heads
        D = self.d_model // H

        q = nn.Dense(self.d_model, dtype=self.dtype, name="query_proj")(x).reshape(B, T, H, D)
        k = nn.Dense(self.d_model, dtype=self.dtype, name="key_proj")(x).reshape(B, T, H, D)
        v = nn.Dense(self.d_model, dtype=self.dtype, name="value_proj")(x).reshape(B, T, H, D)
        p = nn.Dense(self.d_model, use_bias=False, dtype=self.dtype,
                     name="pos_proj")(pos_emb).reshape(1, T, H, D)

        u_bias = self.param("u_bias", nn.initializers.xavier_uniform(), (H, D), jnp.float32)
        v_bias = self.param("v_bias", nn.initializers.xavier_uniform(), (H, D), jnp.float32)

        content = jnp.einsum("bthd,bshd->bhts", q + u_bias.astype(q.dtype), k,
                             preferred_element_type=jnp.float32)
        pos = jnp.einsum("bthd,zshd->bhts", q + v_bias.astype(q.dtype), p,
                         preferred_element_type=jnp.float32)

        # _relative_shift (attention.py:107-117): left-pad last dim with a zero
        # column, fold, and drop the first row.
        pad = jnp.zeros(pos.shape[:-1] + (1,), pos.dtype)
        padded = jnp.concatenate([pad, pos], axis=-1)  # (B, H, T, S+1)
        padded = padded.reshape(B, H, T + 1, T)
        pos = padded[:, :, 1:].reshape(B, H, T, T)

        score = (content + pos) / math.sqrt(self.d_model)
        attn = jax.nn.softmax(score.astype(jnp.float32), axis=-1).astype(self.dtype)
        if not deterministic and self.dropout > 0:
            attn = nn.Dropout(self.dropout, deterministic=False)(attn)
        ctx = jnp.einsum("bhts,bshd->bthd", attn, v).reshape(B, T, self.d_model)
        return nn.Dense(self.d_model, dtype=self.dtype, name="out_proj")(ctx)


class ConformerConvModule(nn.Module):
    """(convolution.py ConformerConvModule)."""

    dim: int
    kernel_size: int = 31
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, deterministic: bool = True):
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        h = nn.Dense(2 * self.dim, dtype=self.dtype, name="pw_conv1")(h)
        a, b = jnp.split(h, 2, axis=-1)
        h = a * jax.nn.sigmoid(b)  # GLU
        pad = (self.kernel_size - 1) // 2
        h = nn.Conv(self.dim, kernel_size=(self.kernel_size,), strides=(1,),
                    padding=((pad, pad),), feature_group_count=self.dim,
                    use_bias=False, dtype=self.dtype, name="dw_conv")(h)
        # BatchNorm1d over channels, reducing (B, T)
        h = TorchBatchNorm(feat_shape=(self.dim,), reduce_axes=(0, 1),
                           dtype=self.dtype, name="bn")(h, use_running_average=not train)
        h = nn.silu(h)
        h = nn.Dense(self.dim, dtype=self.dtype, name="pw_conv2")(h)
        if not deterministic and self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=False)(h)
        return h


class ConformerBlock(nn.Module):
    encoder_dim: int
    num_heads: int = 8
    ffn_expansion: int = 4
    conv_kernel_size: int = 31
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, deterministic: bool = True):
        x = x + 0.5 * FeedForwardModule(self.encoder_dim, self.ffn_expansion,
                                        self.dropout, self.dtype, name="ff1")(x, deterministic)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="attn_norm")(x)
        pos = jnp.asarray(sinusoid_position_encoding(x.shape[1], self.encoder_dim),
                          dtype=x.dtype)[None]
        h = RelativeMultiHeadAttention(self.encoder_dim, self.num_heads,
                                       self.dropout, self.dtype, name="attn")(h, pos, deterministic)
        if not deterministic and self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=False)(h)
        x = x + h
        x = x + ConformerConvModule(self.encoder_dim, self.conv_kernel_size,
                                    self.dropout, self.dtype, name="conv")(x, train, deterministic)
        x = x + 0.5 * FeedForwardModule(self.encoder_dim, self.ffn_expansion,
                                        self.dropout, self.dtype, name="ff2")(x, deterministic)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="final_norm")(x)


class ConformerBlocks(nn.Module):
    encoder_dim: int
    num_layers: int = 2
    num_heads: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, deterministic: bool = True):
        for i in range(self.num_layers):
            x = ConformerBlock(self.encoder_dim, num_heads=self.num_heads,
                               dtype=self.dtype, name=f"layers_{i}")(x, train, deterministic)
        return x
