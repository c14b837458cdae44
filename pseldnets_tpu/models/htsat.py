"""HTS-AT (hierarchical token-semantic audio transformer, Swin-style) encoder.

Checkpoint-compatible reimplementation of the reference encoder
(src/models/components/htsat.py:23-568):

* reshape_wav2img — pad time to spec_size*freq_ratio frames and fold
  freq_ratio time-groups into the frequency axis → a (256, 256) "image"
  (htsat.py:493-511)
* PatchEmbed 4x4/4 → 64x64 tokens, embed 96 (model_utilities.py:174-213)
* 4 BasicLayers (depths 2/2/6/2, heads 4/8/16/32) of windowed attention with
  relative-position bias, cyclic shift every other block, PatchMerging between
  stages (htsat.py:53-382)
* final LayerNorm + token-map reshape to (B, 768, SF, ST) with the frequency
  folding inverted (htsat.py:513-534)

TPU notes: window partition/reverse are pure reshapes+transposes (layout-friendly;
no gather), the shift is jnp.roll, attention masks and relative-position indices
are static numpy constants baked at trace time, and softmax runs in f32.
"""

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .adapters import AdaptConfig, AdaptDense, Adapter, NO_ADAPT
from .common import DropPath, Mlp, PatchEmbed

Dtype = Any


def window_partition(x: jnp.ndarray, w: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B*nW, w*w, C)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // w, w, W // w, w, C)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(-1, w * w, C)


def window_reverse(windows: jnp.ndarray, w: int, H: int, W: int) -> jnp.ndarray:
    """(B*nW, w, w, C) -> (B, H, W, C)."""
    C = windows.shape[-1]
    B = windows.shape[0] // (H * W // w // w)
    x = windows.reshape(B, H // w, W // w, w, w, C)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(B, H, W, C)


def relative_position_index(w: int) -> np.ndarray:
    """Static (w*w, w*w) index into the (2w-1)^2 bias table (htsat.py:79-90)."""
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, N, N)
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += w - 1
    rel[:, :, 1] += w - 1
    rel[:, :, 0] *= 2 * w - 1
    return rel.sum(-1)


def shift_attn_mask(H: int, W: int, w: int, shift: int) -> np.ndarray:
    """Static (nW, w*w, w*w) additive mask for shifted windows (htsat.py:203-222)."""
    img = np.zeros((1, H, W, 1))
    cnt = 0
    for hs in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
        for ws in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
            img[:, hs, ws, :] = cnt
            cnt += 1
    win = img.reshape(1, H // w, w, W // w, w, 1).transpose(0, 1, 3, 2, 4, 5)
    win = win.reshape(-1, w * w)
    mask = win[:, None, :] - win[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    """W-MSA with relative position bias (htsat.py:53-148)."""

    dim: int
    window_size: int
    num_heads: int
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    adapt: AdaptConfig = NO_ADAPT
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[np.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        B_, N, C = x.shape
        nh = self.num_heads
        hd = C // nh
        scale = hd ** -0.5

        qkv = AdaptDense(3 * self.dim, use_bias=self.qkv_bias, dtype=self.dtype,
                         name="qkv", **self.adapt.lora_linear_args())(x)
        qkv = qkv.reshape(B_, N, 3, nh, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]  # (B_, nh, N, hd)

        attn = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k,
                          preferred_element_type=jnp.float32)

        table = self.param("relative_position_bias_table",
                           nn.initializers.truncated_normal(0.02),
                           ((2 * self.window_size - 1) ** 2, nh), jnp.float32)
        idx = relative_position_index(self.window_size).reshape(-1)
        bias = table[idx].reshape(N, N, nh).transpose(2, 0, 1)  # (nh, N, N)
        attn = attn + bias[None]

        if mask is not None:
            nW = mask.shape[0]
            m = jnp.asarray(mask)  # (nW, N, N)
            attn = attn.reshape(B_ // nW, nW, nh, N, N) + m[None, :, None]
            attn = attn.reshape(B_, nh, N, N)
        # max SIGNED pre-softmax logit: consumed by
        # serving.guard.resolve_nomax (the fused kernels' no-max exp2
        # softmax overflows only for logits ABOVE +127 log2 units; the
        # -100 shift-mask / -1e5 pairing biases underflow to exactly 0 and
        # are safe, so abs would false-positive on every shifted block)
        self.sow("intermediates", "attn_logit_max",
                 jnp.max(attn.astype(jnp.float32)))
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        # Eval-time attention-map hook (htsat.py:145,264,370-372): the
        # reference threads post-softmax maps out of every block when
        # `not self.training` (its forward_features then discards them —
        # debugging/visualization only). sow() is the flax analogue: free
        # unless the caller opts in with
        # `apply(..., mutable=["intermediates"])`, which returns per-block
        # (B*nW, nh, N, N) window-attention maps keyed by module path.
        self.sow("intermediates", "attn", attn)
        if not deterministic and self.attn_drop > 0:
            attn = nn.Dropout(self.attn_drop, deterministic=False)(attn)

        x = jnp.einsum("bhnm,bhmd->bhnd", attn, v).transpose(0, 2, 1, 3).reshape(B_, N, C)
        x = AdaptDense(self.dim, dtype=self.dtype, name="proj",
                       **self.adapt.lora_linear_args())(x)
        if not deterministic and self.proj_drop > 0:
            x = nn.Dropout(self.proj_drop, deterministic=False)(x)
        if self.adapt.spatial_adapter:
            x = Adapter(dim=self.dim, dtype=self.dtype, name="adapter",
                        **self.adapt.adapter_args())(x) + x
        return x


class SwinTransformerBlock(nn.Module):
    """(htsat.py:152-268)."""

    dim: int
    input_resolution: Tuple[int, int]
    num_heads: int
    window_size: int = 8
    shift_size: int = 0
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path_rate: float = 0.0
    adapt: AdaptConfig = NO_ADAPT
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        H, W = self.input_resolution
        w, shift = self.window_size, self.shift_size
        if min(H, W) <= w:
            w, shift = min(H, W), 0  # window covers the whole map (htsat.py:181-184)
        B, L, C = x.shape

        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        x = x.reshape(B, H, W, C)
        if shift > 0:
            x = jnp.roll(x, shift=(-shift, -shift), axis=(1, 2))
        x_windows = window_partition(x, w)

        mask = shift_attn_mask(H, W, w, shift) if shift > 0 else None
        attn_windows = WindowAttention(
            dim=self.dim, window_size=w, num_heads=self.num_heads,
            qkv_bias=self.qkv_bias, attn_drop=self.attn_drop, proj_drop=self.drop,
            adapt=self.adapt, dtype=self.dtype, name="attn",
        )(x_windows, mask, deterministic)

        x = window_reverse(attn_windows.reshape(-1, w, w, C), w, H, W)
        if shift > 0:
            x = jnp.roll(x, shift=(shift, shift), axis=(1, 2))
        x = x.reshape(B, H * W, C)

        dp = DropPath(self.drop_path_rate, name="drop_path")
        x = shortcut + dp(x, deterministic)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        h = Mlp(hidden_features=int(self.dim * self.mlp_ratio), out_features=self.dim,
                drop=self.drop, adapt=self.adapt, dtype=self.dtype, name="mlp")(h, deterministic)
        x = x + dp(h, deterministic)
        return x


class PatchMerging(nn.Module):
    """2x2 token merge + linear reduction (htsat.py:272-311)."""

    input_resolution: Tuple[int, int]
    dim: int
    adapt: AdaptConfig = NO_ADAPT
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        H, W = self.input_resolution
        B, L, C = x.shape
        x = x.reshape(B, H, W, C)
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1).reshape(B, -1, 4 * C)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        x = AdaptDense(2 * self.dim, use_bias=False, dtype=self.dtype,
                       name="reduction", **self.adapt.lora_linear_args())(x)
        return x


class BasicLayer(nn.Module):
    """One Swin stage (htsat.py:317-381)."""

    dim: int
    input_resolution: Tuple[int, int]
    depth: int
    num_heads: int
    window_size: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path_rates: Sequence[float] = ()
    downsample: bool = False
    use_checkpoint: bool = False
    adapt: AdaptConfig = NO_ADAPT
    dtype: Dtype = jnp.float32

    def setup(self):
        # rematerialize block activations in the backward pass when asked —
        # the reference's use_checkpoint flag (htsat.py:333-345,367-368)
        block_cls = (nn.remat(SwinTransformerBlock, static_argnums=(2,))
                     if self.use_checkpoint else SwinTransformerBlock)
        self.blocks = [
            block_cls(
                dim=self.dim, input_resolution=self.input_resolution,
                num_heads=self.num_heads, window_size=self.window_size,
                shift_size=0 if i % 2 == 0 else self.window_size // 2,
                mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias, drop=self.drop,
                attn_drop=self.attn_drop,
                drop_path_rate=self.drop_path_rates[i] if self.drop_path_rates else 0.0,
                adapt=self.adapt, dtype=self.dtype, name=f"blocks_{i}")
            for i in range(self.depth)
        ]
        if self.downsample:
            self.downsample_mod = PatchMerging(
                input_resolution=self.input_resolution, dim=self.dim,
                adapt=self.adapt, dtype=self.dtype, name="downsample")

    def run_blocks(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        for blk in self.blocks:
            x = blk(x, deterministic)
        return x

    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = self.run_blocks(x, deterministic)
        if self.downsample:
            x = self.downsample_mod(x)
        return x


class HTSATEncoder(nn.Module):
    """Full HTS-AT encoder (htsat.py:385-568). __call__ maps a logmel(+IV) clip
    (B, C, T, mel) to the token map (B, num_features, SF, ST').

    ``embed`` / ``run_stage`` / ``finalize`` expose the split forward used by the
    EINV2 dual-branch cross-stitch (reference einv2.py:298-308).
    """

    in_chans: int = 7
    spec_size: int = 256
    patch_size: int = 4
    patch_stride: Tuple[int, int] = (4, 4)
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (4, 8, 16, 32)
    window_size: int = 8
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    mel_bins: int = 64
    drop_path_rate: float = 0.1
    ape: bool = False
    use_checkpoint: bool = False
    patch_norm: bool = True
    norm_before_mlp: str = "ln"
    adapt: AdaptConfig = NO_ADAPT
    dtype: Dtype = jnp.float32

    @property
    def num_layers(self):
        return len(self.depths)

    @property
    def num_features(self):
        return int(self.embed_dim * 2 ** (self.num_layers - 1))

    @property
    def freq_ratio(self):
        return self.spec_size // self.mel_bins

    @property
    def time_res(self):
        """STFT frames per output token (= patch_stride_t * 2^(stages-1))."""
        return self.patch_stride[1] * 2 ** (self.num_layers - 1)

    @property
    def SF(self):
        return self.spec_size // (2 ** (self.num_layers - 1)) \
            // self.patch_stride[0] // self.freq_ratio

    def setup(self):
        self.patch_embed = PatchEmbed(
            img_size=(self.spec_size, self.spec_size),
            patch_size=(self.patch_size, self.patch_size),
            patch_stride=tuple(self.patch_stride), embed_dim=self.embed_dim,
            use_norm=self.patch_norm, adapt=self.adapt, dtype=self.dtype)
        grid = (self.spec_size // self.patch_stride[0],
                self.spec_size // self.patch_stride[1])
        if self.ape:
            self.absolute_pos_embed = self.param(
                "absolute_pos_embed", nn.initializers.truncated_normal(0.02),
                (1, grid[0] * grid[1], self.embed_dim), jnp.float32)
        dpr = list(np.linspace(0, self.drop_path_rate, sum(self.depths)))
        layers = []
        for i in range(self.num_layers):
            layers.append(BasicLayer(
                dim=int(self.embed_dim * 2 ** i),
                input_resolution=(grid[0] // (2 ** i), grid[1] // (2 ** i)),
                depth=self.depths[i], num_heads=self.num_heads[i],
                window_size=self.window_size, mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias, drop=self.drop_rate,
                attn_drop=self.attn_drop_rate,
                drop_path_rates=tuple(dpr[sum(self.depths[:i]):sum(self.depths[:i + 1])]),
                downsample=(i < self.num_layers - 1),
                use_checkpoint=self.use_checkpoint, adapt=self.adapt,
                dtype=self.dtype, name=f"layers_{i}"))
        self.layers = layers
        self.norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)

    def reshape_wav2img(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, C, T, F) -> (B, C, r*F, T'/r) image (htsat.py:493-511)."""
        r = self.freq_ratio
        target_T = self.spec_size * r
        B, C, T, F = x.shape
        assert T <= target_T, f"clip too long: {T} > {target_T}"
        x = jnp.pad(x, ((0, 0), (0, 0), (0, target_T - T), (0, 0)))
        x = jnp.transpose(x, (0, 1, 3, 2))  # (B, C, F, T')
        x = x.reshape(B, C, F, r, target_T // r)
        x = jnp.transpose(x, (0, 1, 3, 2, 4))  # (B, C, r, F, T'/r)
        return x.reshape(B, C, r * F, target_T // r)

    def embed(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        """reshape_wav2img + patch embed + pos dropout (= reference
        forward_patch, htsat.py:547-553 incl. pos_drop :518/:552)."""
        x = self.reshape_wav2img(x)
        x = self.patch_embed(x)
        if self.ape:
            x = x + self.absolute_pos_embed.astype(x.dtype)
        if not deterministic and self.drop_rate > 0 and not self.is_initializing():
            # functional dropout: setup-style module, no inline submodules
            keep = 1.0 - self.drop_rate
            mask = jax.random.bernoulli(self.make_rng("dropout"), keep, x.shape)
            x = jnp.where(mask, x / keep, jnp.zeros_like(x))
        return x

    def run_stage(self, i: int, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        return self.layers[i](x, deterministic)

    def finalize(self, x: jnp.ndarray) -> jnp.ndarray:
        """norm + token-map reshape with frequency unfolding
        (= reference forward_reshape, htsat.py:555-568)."""
        x = self.norm(x)
        B, N, C = x.shape
        frames = self.spec_size
        SF = frames // (2 ** (self.num_layers - 1)) // self.patch_stride[0]
        ST = frames // (2 ** (self.num_layers - 1)) // self.patch_stride[1]
        x = jnp.transpose(x, (0, 2, 1)).reshape(B, C, SF, ST)
        c_freq_bin = SF // self.freq_ratio
        x = x.reshape(B, C, SF // c_freq_bin, c_freq_bin, ST)
        x = jnp.transpose(x, (0, 1, 3, 2, 4)).reshape(B, C, c_freq_bin, -1)
        return x

    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = self.embed(x, deterministic)
        for i in range(self.num_layers):
            x = self.run_stage(i, x, deterministic)
        return self.finalize(x)
