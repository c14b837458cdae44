"""TF-domain augmentations as pure jittable jnp functions with explicit keys.

Parity: reference src/augment/specaug.py:5-63 (time masks applied consistently
to features AND labels via the xy_ratio frames-per-label scaling, iid freq
masks), crop.py:3-32 (per-(sample,channel) random T x F rectangles),
freqshift.py:7-38 (random up/down mel shift with reflect padding).
"""

from typing import Dict

import jax
import jax.numpy as jnp


class SpecAugment:
    def __init__(self, xy_ratio, T=40, F=8, mT=4, mF=2, mask_value=0.0, **_):
        self.T = T
        self.F = F
        self.mT = mT
        self.mF = mF
        self.xy_ratio = int(xy_ratio)
        self.T_y = int(T / self.xy_ratio)
        self.mask_value = mask_value

    def __call__(self, key, batch_x: jnp.ndarray, batch_target: Dict):
        N, C, T_dim, F_dim = batch_x.shape
        T_y_dim = T_dim // self.xy_ratio
        k_t1, k_t2, k_f = jax.random.split(key, 3)

        # time masks: shared between features and every *_label target
        value = jax.random.uniform(k_t1, (self.mT, N)) * self.T_y
        min_value = jax.random.uniform(k_t2, (self.mT, N)) * (T_y_dim - value)
        start = min_value.astype(jnp.int32)
        end = start + value.astype(jnp.int32)

        t_y = jnp.arange(T_y_dim)
        mask_y = jnp.any((t_y[None, None] >= start[..., None])
                         & (t_y[None, None] < end[..., None]), axis=0)  # (N, T_y)
        new_target = dict(batch_target)
        for k, v in batch_target.items():
            if "label" not in k:
                continue
            m = mask_y.reshape(mask_y.shape + (1,) * (v.ndim - 2))
            new_target[k] = jnp.where(m, self.mask_value, v)

        t_x = jnp.arange(T_dim)
        mask_x = jnp.any((t_x[None, None] >= start[..., None] * self.xy_ratio)
                         & (t_x[None, None] < end[..., None] * self.xy_ratio), axis=0)
        batch_x = jnp.where(mask_x[:, None, :, None], self.mask_value, batch_x)

        # iid freq masks (torchaudio mask_along_axis_iid semantics: per (N, C))
        for i in range(self.mF):
            kf1, kf2, k_f = jax.random.split(jax.random.fold_in(k_f, i), 3)
            value = jax.random.uniform(kf1, (N, C)) * self.F
            min_v = jax.random.uniform(kf2, (N, C)) * (F_dim - value)
            f = jnp.arange(F_dim)
            m = (f[None, None] >= min_v[..., None].astype(jnp.int32)) & \
                (f[None, None] < (min_v + value)[..., None].astype(jnp.int32))
            batch_x = jnp.where(m[:, :, None, :], self.mask_value, batch_x)
        return batch_x, new_target


class Crop:
    def __init__(self, T=8, F=4, mC=4, mask_value=0.0, **_):
        self.T = T
        self.F = F
        self.mC = mC
        self.mask_value = mask_value

    def __call__(self, key, batch_x: jnp.ndarray, batch_target: Dict):
        N, C, T_dim, F_dim = batch_x.shape
        k1, k2, k3, k4 = jax.random.split(key, 4)
        value_t = jax.random.uniform(k1, (self.mC, N, C)) * self.T
        min_t = jax.random.uniform(k2, (self.mC, N, C)) * (T_dim - value_t)
        value_f = jax.random.uniform(k3, (self.mC, N, C)) * self.F
        min_f = jax.random.uniform(k4, (self.mC, N, C)) * (F_dim - value_f)
        st, et = min_t.astype(jnp.int32), (min_t.astype(jnp.int32) + value_t.astype(jnp.int32))
        sf, ef = min_f.astype(jnp.int32), (min_f.astype(jnp.int32) + value_f.astype(jnp.int32))
        t = jnp.arange(T_dim)[None, None, None, :, None]
        f = jnp.arange(F_dim)[None, None, None, None, :]
        mask = ((t >= st[..., None, None]) & (t < et[..., None, None])
                & (f >= sf[..., None, None]) & (f < ef[..., None, None]))
        mask = jnp.any(mask, axis=0)  # (N, C, T, F)
        return jnp.where(mask, self.mask_value, batch_x), batch_target


class FreqShift:
    def __init__(self, p=0.5, shift_range=15, direction=None, mode="reflect", **_):
        self.p = p
        self.shift_range = shift_range
        self.direction = None if direction in (None, "None", "none") else direction
        self.mode = mode

    def __call__(self, key, batch_x: jnp.ndarray, batch_target: Dict):
        N, C, T_dim, F_dim = batch_x.shape
        shift_range = self.shift_range or int(F_dim * 0.08)
        k1, k2, k3 = jax.random.split(key, 3)
        apply = jax.random.uniform(k1, (N,)) < self.p
        shift = jax.random.randint(k2, (N,), 0, max(shift_range, 1))
        if self.direction is None:
            up = jax.random.bernoulli(k3, 0.5, (N,))
        else:
            up = jnp.full((N,), self.direction == "up")

        pad = jnp.pad(batch_x, ((0, 0), (0, 0), (0, 0), (shift_range, shift_range)),
                      mode=self.mode)
        f = jnp.arange(F_dim)
        # up: content moves up (pad left by s, keep first F) -> src = f - s + R
        # down: pad right by s, drop first s -> src = f + s + R
        src_up = f[None] - shift[:, None] + shift_range
        src_dn = f[None] + shift[:, None] + shift_range
        src = jnp.where(up[:, None], src_up, src_dn)
        src = jnp.where(apply[:, None], src, f[None] + shift_range)
        shifted = jnp.take_along_axis(pad, src[:, None, None, :], axis=3)
        return shifted, batch_target
