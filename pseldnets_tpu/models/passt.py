"""PaSST: ViT with decomposed time/freq position embeddings and patchout.

Parity: reference src/models/components/passt.py:50-380 —
PatchEmbed 16x16 stride 10 on (B, C, F=64, T) · time pos-embed random-offset
crop at train (:221-235) · structured patchout dropping random freq rows /
time cols and unstructured token patchout at train (:239-261) · cls+dist
tokens (:263-272) · plain ViT blocks · final LayerNorm "head" over the
freq-averaged token map (:278-291).

TPU notes: patchout keeps static shapes (a fixed count of random indices is
gathered with jnp.take); the reference's feature_map reshape assumes
s_patchout_t == u_patchout == 0 when the SELD token map is consumed — we keep
time patchout consistent by tracking the reduced grid instead.
"""

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .common import Mlp, PatchEmbed, DropPath

Dtype = Any


class Attention(nn.Module):
    """Plain ViT attention (passt.py:50-82)."""

    dim: int
    num_heads: int = 12
    qkv_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, N, C = x.shape
        H = self.num_heads
        D = C // H
        qkv = nn.Dense(3 * self.dim, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, H, D).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jnp.einsum("bhnd,bhmd->bhnm", q * (D ** -0.5), k,
                          preferred_element_type=jnp.float32)
        # max SIGNED pre-softmax logit for serving.guard.resolve_nomax
        # (see models.htsat.Attention)
        self.sow("intermediates", "attn_logit_max",
                 jnp.max(attn.astype(jnp.float32)))
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        x = jnp.einsum("bhnm,bhmd->bhnd", attn, v).transpose(0, 2, 1, 3).reshape(B, N, C)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(x)


class Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path_rate: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        dp = DropPath(self.drop_path_rate, name="drop_path")
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        x = x + dp(Attention(self.dim, self.num_heads, self.qkv_bias,
                             self.dtype, name="attn")(h), deterministic)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        x = x + dp(Mlp(hidden_features=int(self.dim * self.mlp_ratio),
                       out_features=self.dim, dtype=self.dtype, name="mlp")(h, deterministic),
                   deterministic)
        return x


class PaSSTEncoder(nn.Module):
    in_chans: int = 7
    u_patchout: int = 0
    s_patchout_t: int = 0
    s_patchout_f: int = 0
    img_size: Tuple[int, int] = (64, 1001)
    patch_size: int = 16
    stride: int = 10
    embed_dim: int = 768
    depth: int = 7
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    distilled: bool = True
    drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    dtype: Dtype = jnp.float32

    @property
    def grid_size(self):
        return (self.img_size[0] // self.stride, self.img_size[1] // self.stride)

    @property
    def num_tokens(self):
        return 2 if self.distilled else 1

    @property
    def num_features(self):
        return self.embed_dim

    def setup(self):
        self.patch_embed = PatchEmbed(
            img_size=self.img_size, patch_size=(self.patch_size, self.patch_size),
            patch_stride=(self.stride, self.stride), embed_dim=self.embed_dim,
            flatten=False, use_norm=False, padding=True, dtype=self.dtype)
        init = nn.initializers.truncated_normal(0.02)
        self.cls_token = self.param("cls_token", init, (1, 1, self.embed_dim), jnp.float32)
        if self.distilled:
            self.dist_token = self.param("dist_token", init, (1, 1, self.embed_dim), jnp.float32)
        self.new_pos_embed = self.param("new_pos_embed", init,
                                        (1, self.num_tokens, self.embed_dim), jnp.float32)
        self.freq_new_pos_embed = self.param("freq_new_pos_embed", init,
                                             (1, self.embed_dim, self.grid_size[0], 1), jnp.float32)
        self.time_new_pos_embed = self.param("time_new_pos_embed", init,
                                             (1, self.embed_dim, 1, self.grid_size[1]), jnp.float32)
        self.blocks = [Block(dim=self.embed_dim, num_heads=self.num_heads,
                             mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                             drop_path_rate=self.drop_path_rate * i / max(self.depth - 1, 1),
                             dtype=self.dtype, name=f"blocks_{i}")
                       for i in range(self.depth)]
        self.norm = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)
        # reference head = Sequential(LayerNorm, Identity) applied to the token map
        self.head_norm = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="head_0")

    # -- split forward (reference forward_before/forward_after for EINV2) ------
    def forward_before(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """(B, C, T, F) -> (B, tokens+2, E)."""
        x = jnp.transpose(x, (0, 1, 3, 2))  # (B, C, F, T)
        x = self.patch_embed(x)  # NCHW: (B, E, F', T')
        B, E, Fg, Tg = x.shape

        tpe = self.time_new_pos_embed.astype(x.dtype)
        if train and not self.is_initializing():
            max_off = 1 + tpe.shape[-1] - Tg
            off = jax.random.randint(self.make_rng("patchout"), (), 0, max_off)
            tpe = jax.lax.dynamic_slice_in_dim(tpe, off, Tg, axis=3)
        else:
            tpe = tpe[:, :, :, :Tg]
        x = x + tpe
        x = x + self.freq_new_pos_embed.astype(x.dtype)

        if train and self.s_patchout_t and not self.is_initializing():
            keep = Tg - self.s_patchout_t
            idx = jnp.sort(jax.random.permutation(self.make_rng("patchout"), Tg)[:keep])
            x = jnp.take(x, idx, axis=3)
            Tg = keep
        if train and self.s_patchout_f and not self.is_initializing():
            keep = Fg - self.s_patchout_f
            idx = jnp.sort(jax.random.permutation(self.make_rng("patchout"), Fg)[:keep])
            x = jnp.take(x, idx, axis=2)
            Fg = keep

        x = x.reshape(B, E, Fg * Tg).transpose(0, 2, 1)  # (B, N, E)
        if train and self.u_patchout and not self.is_initializing():
            N = x.shape[1]
            keep = N - self.u_patchout
            idx = jnp.sort(jax.random.permutation(self.make_rng("patchout"), N)[:keep])
            x = jnp.take(x, idx, axis=1)

        npe = self.new_pos_embed.astype(x.dtype)
        cls = jnp.broadcast_to(self.cls_token.astype(x.dtype) + npe[:, :1],
                               (B, 1, E))
        if self.distilled:
            dist = jnp.broadcast_to(self.dist_token.astype(x.dtype) + npe[:, 1:],
                                    (B, 1, E))
            x = jnp.concatenate([cls, dist, x], axis=1)
        else:
            x = jnp.concatenate([cls, x], axis=1)
        if train and self.drop_rate > 0 and not self.is_initializing():
            # reference pos_drop after the token concat (passt.py:356).
            # Functional dropout: setup-style modules can't create inline
            # submodules outside @compact.
            keep = 1.0 - self.drop_rate
            mask = jax.random.bernoulli(self.make_rng("dropout"), keep, x.shape)
            x = jnp.where(mask, x / keep, jnp.zeros_like(x))
        return x

    def run_block(self, i: int, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        return self.blocks[i](x, deterministic)

    def forward_after(self, x: jnp.ndarray, train: bool = False):
        """-> (token_map (B, T', E), features)."""
        x = self.norm(x)
        nt = self.num_tokens
        feature = x[:, :nt]
        feature_map = x[:, nt:]
        B, N, E = feature_map.shape
        Fg = self.grid_size[0] - (self.s_patchout_f if train else 0)
        Tg = N // Fg
        fm = feature_map.transpose(0, 2, 1).reshape(B, E, Fg, Tg)
        fm = fm.mean(axis=2).transpose(0, 2, 1)  # (B, T', E)
        fm = self.head_norm(fm)
        if self.distilled:
            feature = feature.mean(axis=1)
        return fm, feature

    def __call__(self, x: jnp.ndarray, train: bool = False,
                 deterministic: bool = True):
        h = self.forward_before(x, train)
        for i in range(self.depth):
            h = self.run_block(i, h, deterministic)
        return self.forward_after(h, train)
