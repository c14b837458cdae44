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
            # raw-float boundary comparison, exactly torchaudio
            # mask_along_axis_iid (flooring both ends shifted every mask one
            # bin low)
            m = (f[None, None] >= min_v[..., None]) & \
                (f[None, None] < (min_v + value)[..., None])
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


class TrackMixDevice:
    """Feature-domain TrackMix for the device TF chain.

    The reference applies TrackMix inside the random TF-aug chains — i.e. on
    FEATURES, after extraction (aug_TF excludes only rotate/wavmix; reference
    components/model_module.py:74-78 + augment/trackmix.py). ov1 samples are
    mixed pairwise with Beta(α,α) weights and labels move into 2-track form.

    Jit notes: the ov1 subset is selected with masks; pairing is a random
    cyclic shift over the (randomly ordered) ov1 samples instead of a full
    random permutation — distributionally equivalent up to pairing topology.
    """

    def __init__(self, alpha=0.5, **_):
        self.alpha = float(alpha)

    def __call__(self, key, batch_x: jnp.ndarray, batch_target: Dict,
                 ov1_mask: jnp.ndarray):
        B = batch_x.shape[0]
        k1, k2 = jax.random.split(key)
        # random order with ov1 first; cyclic pairing within the ov1 prefix
        order = jnp.argsort(jnp.where(ov1_mask, 0.0, 1.0)
                            + jax.random.uniform(k1, (B,)) * 1e-3)
        m = jnp.sum(ov1_mask.astype(jnp.int32))
        pos = jnp.argsort(order)  # position of each sample in `order`
        nxt = jnp.where(pos + 1 < m, pos + 1, 0)
        partner = order[nxt]  # for ov1 samples: another ov1 sample
        lam = jnp.asarray(
            jax.random.beta(k2, self.alpha, self.alpha, (B,)), batch_x.dtype)
        gate = ov1_mask  # only ov1 samples are mixed

        def mix(x, l):
            shape = (B,) + (1,) * (x.ndim - 1)
            lm = l.reshape(shape)
            g = gate.reshape(shape)
            return jnp.where(g, lm * x + (1 - lm) * x[partner], x)

        batch_x = mix(batch_x, lam)
        new_target = dict(batch_target)
        if "sed_label" in batch_target:
            sed, doa = batch_target["sed_label"], batch_target["doa_label"]
            l_s = lam.reshape((B,) + (1,) * (sed.ndim - 2))
            g_s = gate.reshape((B,) + (1,) * (sed.ndim - 1))
            mixed_sed = jnp.stack((l_s * sed[:, :, 0],
                                   (1 - l_s) * sed[partner][:, :, 0],
                                   jnp.zeros_like(sed[:, :, 0])), axis=2)
            mixed_doa = jnp.stack((doa[:, :, 0], doa[partner][:, :, 0],
                                   jnp.zeros_like(doa[:, :, 0])), axis=2)
            new_target["sed_label"] = jnp.where(g_s, mixed_sed, sed)
            new_target["doa_label"] = jnp.where(
                gate.reshape((B,) + (1,) * (doa.ndim - 1)), mixed_doa, doa)
        elif "accdoa_label" in batch_target:
            new_target["accdoa_label"] = mix(batch_target["accdoa_label"], lam)
        elif "adpit_label" in batch_target:
            lab = batch_target["adpit_label"]  # (B, T, 6, 4, K)
            a = lab
            b = lab[partner]
            l_y = lam.reshape(B, 1, 1, 1, 1)
            base_act = l_y * a[:, :, :, 0:1] + (1 - l_y) * b[:, :, :, 0:1]
            base = jnp.concatenate([base_act, a[:, :, :, 1:] + b[:, :, :, 1:]],
                                   axis=3)
            # same-class collision (ov1 inputs: at most one active class) ->
            # move to b0/b1 slots, zero the rest of the frame
            coll = jnp.sum(a[:, :, 0, 0] * b[:, :, 0, 0], axis=-1) > 0  # (B, T)
            collf = coll[:, :, None, None, None]
            slot1 = jnp.concatenate([l_y * a[:, :, 0:1, 0:1],
                                     a[:, :, 0:1, 1:]], axis=3)
            slot2 = jnp.concatenate([(1 - l_y) * b[:, :, 0:1, 0:1],
                                     b[:, :, 0:1, 1:]], axis=3)
            zeros = jnp.zeros_like(base[:, :, 0:1])
            coll_label = jnp.concatenate(
                [zeros, slot1, slot2, zeros, zeros, zeros], axis=2)
            mixed = jnp.where(collf, coll_label, base)
            g = gate.reshape(B, 1, 1, 1, 1)
            new_target["adpit_label"] = jnp.where(g, mixed, lab)
        return batch_x, new_target
