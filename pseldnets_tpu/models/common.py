"""Shared model plumbing: torch-semantics BatchNorm, per-channel "scalar" BN,
ViT Mlp/PatchEmbed/DropPath, CrossStitch, GRU/Transformer decoders, and the
time-axis interpolate used by every head.

Parity targets: reference src/models/components/model_utilities.py (Mlp :129-171,
PatchEmbed :174-213, DropPath :216-242, CrossStitch :35-54, Decoder :245-269) and
src/models/components/utils.py (interpolate :25-52).
"""

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .adapters import AdaptConfig, AdaptDense, AdaptConv, Adapter, NO_ADAPT

Dtype = Any


def to_2tuple(x):
    return tuple(x) if isinstance(x, (tuple, list)) else (x, x)


# ---------------------------------------------------------------------------
# Normalization with torch.nn.BatchNorm semantics (momentum 0.1, eps 1e-5,
# biased variance for normalization, unbiased for the running update).
# Under pjit/GSPMD the batch reductions are global across the data mesh axis,
# which gives sync-BN for free (no torch sync_batchnorm analogue needed).
# ---------------------------------------------------------------------------
class TorchBatchNorm(nn.Module):
    """BatchNorm over arbitrary reduce axes with feature shape `feat_shape`."""

    feat_shape: Tuple[int, ...]
    reduce_axes: Tuple[int, ...]
    momentum: float = 0.1
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, use_running_average: bool = True) -> jnp.ndarray:
        weight = self.param("weight", nn.initializers.ones, self.feat_shape, jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, self.feat_shape, jnp.float32)
        ra_mean = self.variable("batch_stats", "running_mean",
                                lambda: jnp.zeros(self.feat_shape, jnp.float32))
        ra_var = self.variable("batch_stats", "running_var",
                               lambda: jnp.ones(self.feat_shape, jnp.float32))

        # broadcast shape: feature dims stay, reduce dims -> 1
        shape = list(x.shape)
        for ax in self.reduce_axes:
            shape[ax] = 1

        if use_running_average:
            mean = ra_mean.value.reshape(shape)
            var = ra_var.value.reshape(shape)
        else:
            xf = x.astype(jnp.float32)
            mean_full = jnp.mean(xf, axis=self.reduce_axes)
            var_full = jnp.var(xf, axis=self.reduce_axes)
            n = 1
            for ax in self.reduce_axes:
                n *= x.shape[ax]
            if not self.is_initializing():
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean_full
                ra_var.value = (1 - self.momentum) * ra_var.value + \
                    self.momentum * var_full * (n / max(n - 1, 1))
            mean = mean_full.reshape(shape)
            var = var_full.reshape(shape)

        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.eps)
        y = y * weight.reshape(shape) + bias.reshape(shape)
        return y.astype(self.dtype)


class ScalarBN(nn.Module):
    """The reference's per-channel "scalar" layers — one BatchNorm2d(mel_bins) per
    input channel applied over (B, T) for each (channel, mel) pair (reference
    src/models/accdoa.py:26,73-77). Fused here into a single BN with feature
    shape (C, F) on (B, C, T, F) input — one kernel instead of C python-loop BNs.
    """

    num_channels: int
    mel_bins: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, use_running_average: bool = True) -> jnp.ndarray:
        bn = TorchBatchNorm(feat_shape=(self.num_channels, self.mel_bins),
                            reduce_axes=(0, 2), dtype=self.dtype, name="bn")
        return bn(x, use_running_average=use_running_average)


class BatchNorm2d(nn.Module):
    """torch BatchNorm2d over NHWC input (features last)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, use_running_average: bool = True) -> jnp.ndarray:
        bn = TorchBatchNorm(feat_shape=(self.features,), reduce_axes=(0, 1, 2),
                            dtype=self.dtype, name="bn")
        return bn(x, use_running_average=use_running_average)


# ---------------------------------------------------------------------------
# ViT plumbing
# ---------------------------------------------------------------------------
def drop_path(x: jnp.ndarray, rate: float, deterministic: bool, rng=None) -> jnp.ndarray:
    """Stochastic depth per sample (reference model_utilities.py:216-231)."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jnp.floor(keep + jax.random.uniform(rng, shape, dtype=x.dtype))
    return x / keep * mask


class DropPath(nn.Module):
    rate: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if deterministic or self.rate == 0.0:
            return x
        return drop_path(x, self.rate, False, self.make_rng("dropout"))


class Mlp(nn.Module):
    """ViT MLP, optionally with a parallel bottleneck adapter (reference
    model_utilities.py:129-171)."""

    hidden_features: int
    out_features: int
    drop: float = 0.0
    adapt: AdaptConfig = NO_ADAPT
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        xs = 0.0
        if self.adapt.mlp_adapter:
            xs = Adapter(dim=x.shape[-1], dtype=self.dtype, name="adapter",
                         **self.adapt.adapter_args())(x)
            if self.adapt.new_adapter:
                # optional second parallel bottleneck (reference
                # model_utilities.py:153-170: adapter_ds, summed like xs)
                xs = xs + Adapter(dim=x.shape[-1], dtype=self.dtype,
                                  name="adapter_ds",
                                  **self.adapt.ds_adapter_args())(x)
        h = AdaptDense(self.hidden_features, dtype=self.dtype, name="fc1",
                       **self.adapt.lora_linear_args())(x)
        h = nn.gelu(h, approximate=False)
        if self.drop > 0 and not deterministic:
            h = nn.Dropout(self.drop, deterministic=False)(h)
        h = AdaptDense(self.out_features, dtype=self.dtype, name="fc2",
                       **self.adapt.lora_linear_args())(h)
        h = h + xs
        if self.drop > 0 and not deterministic:
            h = nn.Dropout(self.drop, deterministic=False)(h)
        return h


class PatchEmbed(nn.Module):
    """2D patch embedding conv (reference model_utilities.py:174-213).

    Input NCHW (torch layout at the call site is transposed by callers to NHWC
    before the conv); here we accept NCHW and convert once.
    Output: (B, N, C) when flatten else (B, embed_dim, H', W').
    """

    img_size: Tuple[int, int]
    patch_size: Tuple[int, int]
    patch_stride: Tuple[int, int]
    embed_dim: int
    flatten: bool = True
    use_norm: bool = True
    padding: bool = True
    adapt: AdaptConfig = NO_ADAPT
    dtype: Dtype = jnp.float32

    @property
    def grid_size(self):
        return (self.img_size[0] // self.patch_stride[0],
                self.img_size[1] // self.patch_stride[1])

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        assert x.shape[2] == self.img_size[0] and x.shape[3] == self.img_size[1], \
            f"input {x.shape[2:]} != img_size {self.img_size}"
        if self.padding:
            ph = (self.patch_size[0] - self.patch_stride[0]) // 2
            pw = (self.patch_size[1] - self.patch_stride[1]) // 2
            pad = ((ph, ph), (pw, pw))
        else:
            pad = ((0, 0), (0, 0))
        x = jnp.transpose(x, (0, 2, 3, 1))  # NCHW -> NHWC
        x = AdaptConv(self.embed_dim, kernel_size=self.patch_size,
                      strides=self.patch_stride, padding=pad, dtype=self.dtype,
                      name="proj", **self.adapt.lora_conv_args())(x)
        if self.flatten:
            B, H, W, C = x.shape
            x = x.reshape(B, H * W, C)
            if self.use_norm:
                x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
            return x
        return jnp.transpose(x, (0, 3, 1, 2))  # back to NCHW for PaSST


class CrossStitch(nn.Module):
    """Learnable per-channel 2x2 mixing of two branch features (reference
    model_utilities.py:35-54). weight: (C, 2, 2), init U(0.1, 0.9).

    NOTE: faithfully reproduces the reference's sequential update — y is mixed
    using the ALREADY-mixed x (model_utilities.py:50-53).
    """

    feat_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray):
        w = self.param("weight",
                       lambda k, s: jax.random.uniform(k, s, jnp.float32, 0.1, 0.9),
                       (self.feat_dim, 2, 2))
        w = w.astype(self.dtype)
        if x.ndim == 4:  # (N, C, T, F): channel axis 1
            shape = (1, self.feat_dim, 1, 1)
        elif x.ndim == 3:  # (N, T, C): channel axis -1
            shape = (1, 1, self.feat_dim)
        else:
            raise ValueError("x must be 3D or 4D")
        w00, w01 = w[:, 0, 0].reshape(shape), w[:, 0, 1].reshape(shape)
        w10, w11 = w[:, 1, 0].reshape(shape), w[:, 1, 1].reshape(shape)
        x_new = w00 * x + w01 * y
        y_new = w10 * x_new + w11 * y
        return x_new, y_new


# ---------------------------------------------------------------------------
# Time-axis upsampling (reference utils.py:25-52)
# ---------------------------------------------------------------------------
def _linear_upsample_matrix(t_in: int, ratio: int) -> np.ndarray:
    """(t_in*ratio, t_in) interpolation matrix with half-pixel centers —
    identical to torch F.interpolate(mode='bilinear', align_corners=False)
    along time. A fixed matmul instead of jax.image.resize: the latter's
    scale_and_translate lowering blows XLA compile time up by minutes."""
    t_out = t_in * ratio
    src = (np.arange(t_out) + 0.5) / ratio - 0.5
    i0 = np.clip(np.floor(src).astype(int), 0, t_in - 1)
    i1 = np.clip(i0 + 1, 0, t_in - 1)
    w1 = np.clip(src - np.floor(src), 0.0, 1.0)
    w1 = np.where(src < 0, 0.0, w1)  # edge clamp at the left boundary
    m = np.zeros((t_out, t_in), np.float32)
    m[np.arange(t_out), i0] += 1.0 - w1
    m[np.arange(t_out), i1] += w1
    return m


def interpolate(x: jnp.ndarray, ratio: int, method: str = "repeat") -> jnp.ndarray:
    """(B, T, ...) -> (B, T*ratio, ...). 'repeat' duplicates frames; 'bilinear'
    is a linear resize along time with half-pixel centers (torch
    F.interpolate(mode='bilinear', align_corners=False) on the (T, C) plane)."""
    if method == "repeat":
        return jnp.repeat(x, ratio, axis=1)
    m = jnp.asarray(_linear_upsample_matrix(x.shape[1], ratio), dtype=x.dtype)
    return jnp.einsum("st,bt...->bs...", m, x,
                      precision=jax.lax.Precision.HIGHEST)


# ---------------------------------------------------------------------------
# Sequence decoders (reference model_utilities.py:245-269)
# ---------------------------------------------------------------------------
class TorchGRU(nn.Module):
    """Bidirectional multi-layer GRU with torch nn.GRU gate order/packing, so
    converted checkpoints are bit-compatible. Input/output: (B, T, C)."""

    hidden_size: int
    num_layers: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        H = self.hidden_size

        def run_direction(inp, w_ih, w_hh, b_ih, b_hh, reverse: bool):
            if reverse:
                inp = jnp.flip(inp, axis=1)
            # precompute input projections for all steps: (B, T, 3H)
            xi = inp @ w_ih.T + b_ih

            def step(h, xit):
                gh = h @ w_hh.T + b_hh
                xr, xz, xn = jnp.split(xit, 3, axis=-1)
                hr, hz, hn = jnp.split(gh, 3, axis=-1)
                r = jax.nn.sigmoid(xr + hr)
                z = jax.nn.sigmoid(xz + hz)
                n = jnp.tanh(xn + r * hn)
                h_new = (1.0 - z) * n + z * h
                return h_new, h_new

            h0 = jnp.zeros((inp.shape[0], H), inp.dtype)
            _, ys = jax.lax.scan(step, h0, jnp.swapaxes(xi, 0, 1))
            ys = jnp.swapaxes(ys, 0, 1)  # (B, T, H)
            if reverse:
                ys = jnp.flip(ys, axis=1)
            return ys

        h = x
        for layer in range(self.num_layers):
            in_dim = h.shape[-1]
            outs = []
            for direction, suffix in ((False, ""), (True, "_reverse")):
                w_ih = self.param(f"weight_ih_l{layer}{suffix}",
                                  nn.initializers.lecun_normal(), (3 * H, in_dim), jnp.float32)
                w_hh = self.param(f"weight_hh_l{layer}{suffix}",
                                  nn.initializers.lecun_normal(), (3 * H, H), jnp.float32)
                b_ih = self.param(f"bias_ih_l{layer}{suffix}",
                                  nn.initializers.zeros, (3 * H,), jnp.float32)
                b_hh = self.param(f"bias_hh_l{layer}{suffix}",
                                  nn.initializers.zeros, (3 * H,), jnp.float32)
                outs.append(run_direction(h, w_ih.astype(h.dtype), w_hh.astype(h.dtype),
                                          b_ih.astype(h.dtype), b_hh.astype(h.dtype),
                                          direction))
            h = jnp.concatenate(outs, axis=-1)
        return h


class TransformerEncoderLayer(nn.Module):
    """torch nn.TransformerEncoderLayer (post-LN, relu, ffn 2048) parity."""

    d_model: int
    nhead: int = 8
    dim_feedforward: int = 2048
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.nhead, qkv_features=self.d_model, dtype=self.dtype,
            dropout_rate=self.dropout, deterministic=deterministic,
            name="self_attn")
        h = attn(x, x)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x + h)
        h = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x + h)
        return x


class Decoder(nn.Module):
    """gru | conformer | transformer | None (reference model_utilities.py:245-269)."""

    decoder: Optional[str]
    num_feats: int
    num_layers: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if self.decoder in (None, "None", "null", "identity"):
            return x
        if self.decoder == "gru":
            return TorchGRU(hidden_size=self.num_feats // 2,
                            num_layers=self.num_layers, dtype=self.dtype,
                            name="decoder")(x)
        if self.decoder == "conformer":
            from .conformer import ConformerBlocks

            # train = not deterministic: the conv module's BatchNorm must use
            # batch stats (and update running stats) during training, like
            # the reference's nn.BatchNorm1d
            return ConformerBlocks(encoder_dim=self.num_feats,
                                   num_layers=self.num_layers, dtype=self.dtype,
                                   name="decoder")(x, train=not deterministic,
                                                   deterministic=deterministic)
        if self.decoder == "transformer":
            h = x
            for i in range(self.num_layers):
                h = TransformerEncoderLayer(d_model=self.num_feats, dtype=self.dtype,
                                            name=f"decoder_layers_{i}")(h, deterministic)
            return h
        raise NotImplementedError(f"decoder '{self.decoder}' is not implemented")
