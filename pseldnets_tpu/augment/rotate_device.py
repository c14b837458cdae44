"""Device-side FOA rotation augmentation (jittable).

Same transform family as augment.wave_np.Rotation (reference
src/augment/rotate.py): per-sample random channel permutation + sign flips of
the (Y, Z, X) waveform channels with the matching DOA label rotation — but
executed inside the train-step jit, removing the host-side pass over the
waveform batch.

Only used when wavmix is NOT in the augmentation chain: the reference applies
rotate BEFORE wavmix on the host, and moving rotate on-device would flip that
order (train/module.py enforces the fallback).
"""

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_TRANS48 = {
    (0, 1, 2): (1, 2, 3), (0, 2, 1): (2, 1, 3), (1, 0, 2): (3, 2, 1),
    (1, 2, 0): (2, 3, 1), (2, 0, 1): (3, 1, 2), (2, 1, 0): (1, 3, 2),
}
_TRANS16 = {(0, 1, 2): (1, 2, 3), (1, 0, 2): (3, 2, 1)}


class RotationDevice:
    def __init__(self, p: float, rotation_type: int = 48, **_):
        self.p = float(p)
        trans = _TRANS48 if int(rotation_type) == 48 else _TRANS16
        self.perm_table = np.asarray(list(trans.keys()), np.int32)      # (P,3) xx,yy,zz
        self.src_table = np.asarray(list(trans.values()), np.int32)    # (P,3) s_x,s_y,s_z

    def __call__(self, key, batch_x: jnp.ndarray, batch_target: Dict
                 ) -> Tuple[jnp.ndarray, Dict]:
        B = batch_x.shape[0]
        k1, k2, k3 = jax.random.split(key, 3)
        apply = jax.random.uniform(k1, (B,)) < self.p
        pidx = jax.random.randint(k2, (B,), 0, len(self.perm_table))
        signs = jnp.where(jax.random.bernoulli(k3, 0.5, (B, 3)), 1.0, -1.0)

        perm = jnp.asarray(self.perm_table)[pidx]  # (B,3)
        src = jnp.asarray(self.src_table)[pidx]    # (B,3)

        def ch(j):
            return jnp.take_along_axis(batch_x, src[:, j][:, None, None], axis=1)[:, 0]

        rotated = jnp.stack((batch_x[:, 0],
                             signs[:, 1:2] * ch(0),
                             signs[:, 2:3] * ch(1),
                             signs[:, 0:1] * ch(2)), axis=1)
        batch_x = jnp.where(apply[:, None, None], rotated, batch_x)

        def rot_doa(doa):
            """doa: (B, ..., 3) -> rotated, gated by `apply`."""
            extra = doa.ndim - 2
            g = jnp.take_along_axis(
                doa, perm.reshape((B,) + (1,) * extra + (3,)), axis=-1)
            y = g * signs.reshape((B,) + (1,) * extra + (3,))
            gate = apply.reshape((B,) + (1,) * (doa.ndim - 1))
            return jnp.where(gate, y, doa)

        new_target = dict(batch_target)
        if "accdoa_label" in batch_target:
            lab = batch_target["accdoa_label"]
            B_, T, C3 = lab.shape
            doa = jnp.swapaxes(lab.reshape(B_, T, 3, C3 // 3), 2, 3)
            new_target["accdoa_label"] = jnp.swapaxes(
                rot_doa(doa), 2, 3).reshape(B_, T, C3)
        elif "doa_label" in batch_target:
            new_target["doa_label"] = rot_doa(batch_target["doa_label"])
        elif "adpit_label" in batch_target:
            seddoa = jnp.swapaxes(batch_target["adpit_label"], -1, -2)  # (B,T,6,K,4)
            doa = rot_doa(seddoa[..., 1:])
            out = jnp.concatenate([seddoa[..., :1], doa], axis=-1)
            new_target["adpit_label"] = jnp.swapaxes(out, -1, -2)
        return batch_x, new_target
