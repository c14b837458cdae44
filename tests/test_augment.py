"""Augmentation tests: rotation label/waveform consistency vs the reference
torch implementation (seeded RNG alignment is impractical across frameworks,
so we verify invariants + distributional contracts), wavmix/trackmix ADPIT
slot surgery against reference semantics on forced-deterministic draws, and
TF-aug shape/mask contracts."""

import sys, os

sys.path.insert(0, os.path.dirname(__file__))

import numpy as np
import jax
import jax.numpy as jnp

from pseldnets_tpu.augment import (Crop, FreqShift, Rotation, SpecAugment,
                                   TrackMix, WavMix)


class _FixedRng:
    """Deterministic stand-in for np.random with scripted draws."""

    def __init__(self, uniforms=(), randints=(), choices=(), perms=(),
                 randoms=(), betas=()):
        self.uniforms = list(uniforms)
        self.randints = list(randints)
        self.choices = list(choices)
        self.perms = list(perms)
        self.randoms = list(randoms)
        self.betas = list(betas)

    def uniform(self, *a, **k):
        return self.uniforms.pop(0)

    def randint(self, *a, **k):
        return self.randints.pop(0)

    def choice(self, arr, size=None):
        v = self.choices.pop(0)
        return np.asarray(v) if size else v

    def permutation(self, x):
        return np.asarray(self.perms.pop(0))

    def random(self, *a, **k):
        return self.randoms.pop(0)

    def beta(self, a, b, size):
        return np.asarray(self.betas.pop(0), np.float32).reshape(size)


def test_rotation_keeps_w_and_rotates_doa(rng):
    B, T, K = 4, 10, 3
    x = rng.standard_normal((B, 4, 1000)).astype(np.float32)
    lab = rng.standard_normal((B, T, 3 * K)).astype(np.float32)
    rot = Rotation(p=1.0, rotation_type=48, rng=np.random.RandomState(0))
    x2, t2 = rot(x.copy(), {"accdoa_label": lab.copy()})
    # W channel unchanged; rotated channels are signed copies of originals
    np.testing.assert_array_equal(x2[:, 0], x[:, 0])
    for n in range(B):
        for c in range(1, 4):
            match = [np.allclose(np.abs(x2[n, c]), np.abs(x[n, cc]))
                     for cc in range(1, 4)]
            assert any(match)
    # label norms preserved per (frame, class): rotation is orthogonal
    doa = lab.reshape(B, T, 3, K)
    doa2 = t2["accdoa_label"].reshape(B, T, 3, K)
    np.testing.assert_allclose(np.linalg.norm(doa2, axis=2),
                               np.linalg.norm(doa, axis=2), rtol=1e-5)


def test_rotation_waveform_label_consistency(rng):
    """The same (perm, sign) transform must be applied to channels and DOA:
    feeding a DOA that equals the channel index pattern verifies pairing."""
    B, T = 1, 4
    x = np.zeros((B, 4, 8), np.float32)
    for c in range(4):
        x[:, c] = c
    doa = np.tile(np.asarray([1.0, 2.0, 3.0], np.float32), (B, T, 1, 1))  # (B,T,1,3)
    # perm index 3 -> (1,2,0) in _TRANS48 insertion order; signs (sx,sy,sz)
    fixed = _FixedRng(uniforms=[0.0], randints=[3], choices=[(1, -1, 1)])
    rot = Rotation(p=0.5, rotation_type=48, rng=fixed)
    x2, t2 = rot(x.copy(), {"doa_label": doa.copy()})
    # trans48[(1,2,0)] = (2,3,1): new channels = W, sy*x[2], sz*x[3], sx*x[1]
    np.testing.assert_array_equal(x2[0, 1], -1 * x[0, 2])
    np.testing.assert_array_equal(x2[0, 2], 1 * x[0, 3])
    np.testing.assert_array_equal(x2[0, 3], 1 * x[0, 1])
    # doa' = (sx*doa[1], sy*doa[2], sz*doa[0]) = (2, -3, 1)
    np.testing.assert_allclose(t2["doa_label"][0, 0, 0], [2.0, -3.0, 1.0])


def test_trackmix_adpit_same_class_goes_to_b_slots():
    B, T, K = 2, 3, 2
    lab = np.zeros((B, T, 6, 4, K), np.float32)
    lab[:, :, 0, 0, 0] = 1.0  # both samples: class 0 single source in a0
    lab[:, :, 0, 1, 0] = 1.0  # doa x
    x = np.ones((B, 4, 100), np.float32)
    fixed = _FixedRng(perms=[[1, 0]], betas=[[0.4, 0.6]])
    tm = TrackMix(alpha=0.5, rng=fixed)
    x2, t2 = tm(x.copy(), {"adpit_label": lab.copy(), "ov": ["1", "1"]})
    out = t2["adpit_label"]
    # same-class collision: a0 cleared, b0/b1 populated with lam-weighted acts
    assert out[0, 0, 0].sum() == 0
    np.testing.assert_allclose(out[0, 0, 1, 0, 0], 0.4)
    np.testing.assert_allclose(out[0, 0, 2, 0, 0], 0.6)
    assert t2["ov"] == ["2", "2"]


def test_wavmix_skip_on_p(rng):
    x = rng.standard_normal((2, 4, 100)).astype(np.float32)
    fixed = _FixedRng(randoms=[0.99])
    wm = WavMix(alpha=0.5, p=0.5, rng=fixed)
    x2, _ = wm(x.copy(), {"accdoa_label": np.zeros((2, 5, 9), np.float32),
                          "ov": ["1", "1"]})
    np.testing.assert_array_equal(x2, x)


def test_specaug_masks_features_and_labels(rng):
    sa = SpecAugment(xy_ratio=10, T=40, F=8, mT=4, mF=2)
    x = jnp.ones((2, 7, 200, 16))
    lab = jnp.ones((2, 20, 6, 4, 3))
    x2, t2 = sa(jax.random.PRNGKey(0), x, {"adpit_label": lab})
    x2, lab2 = np.asarray(x2), np.asarray(t2["adpit_label"])
    assert (x2 == 0).any() and (x2 == 1).any()
    # time masks consistent: a fully-masked label frame implies the
    # corresponding 10 feature frames are masked too
    masked_label_frames = np.where(lab2[0].reshape(20, -1).sum(-1) == 0)[0]
    for f in masked_label_frames:
        assert (x2[0, :, f * 10:(f + 1) * 10, :] == 0).all()


def test_crop_masks_rectangles(rng):
    cr = Crop(T=8, F=4, mC=4)
    x = jnp.ones((2, 7, 100, 16))
    x2, _ = cr(jax.random.PRNGKey(1), x, {})
    x2 = np.asarray(x2)
    assert (x2 == 0).any() and (x2 == 1).any()


def test_freqshift_shifts_content(rng):
    fs = FreqShift(p=1.0, shift_range=5)
    x = jnp.asarray(np.tile(np.arange(16, dtype=np.float32), (2, 7, 50, 1)))
    x2, _ = fs(jax.random.PRNGKey(2), x, {})
    x2 = np.asarray(x2)
    assert x2.shape == x.shape
    # shifted rows are still monotone sequences of the original values
    assert not np.allclose(x2, np.asarray(x))
