"""Device-side augmentation semantics: TrackMixDevice (feature-domain, ADPIT
slot surgery) and RotationDevice (waveform/label pairing)."""

import numpy as np
import jax
import jax.numpy as jnp

from pseldnets_tpu.augment import RotationDevice, TrackMixDevice


def test_trackmix_device_adpit_mixing(rng):
    B, T, K = 4, 6, 3
    lab = np.zeros((B, T, 6, 4, K), np.float32)
    # distinct classes per sample -> no collisions
    for b in range(B):
        lab[b, :, 0, 0, b % K] = 1.0
        lab[b, :, 0, 1, b % K] = 1.0  # doa x
    x = np.tile(np.arange(B, dtype=np.float32)[:, None, None, None],
                (1, 7, T * 10, 8))
    tm = TrackMixDevice(alpha=0.5)
    ov1 = jnp.ones((B,), bool)
    x2, t2 = tm(jax.random.PRNGKey(0), jnp.asarray(x),
                {"adpit_label": jnp.asarray(lab)}, ov1)
    out = np.asarray(t2["adpit_label"])
    # activity mass conserved per frame (acts sum to 1 across slots/classes)
    np.testing.assert_allclose(out[:, :, :, 0, :].sum(axis=(2, 3)), 1.0,
                               atol=1e-5)
    # features mixed: values must be convex combos of sample indices
    x2 = np.asarray(x2)
    assert np.all(x2 >= -1e-5) and np.all(x2 <= B - 1 + 1e-5)


def test_trackmix_device_collision_moves_to_b_slots(rng):
    B, T, K = 2, 3, 2
    lab = np.zeros((B, T, 6, 4, K), np.float32)
    lab[:, :, 0, 0, 0] = 1.0  # SAME class in both samples
    lab[:, :, 0, 1, 0] = 1.0
    x = np.ones((B, 7, 30, 8), np.float32)
    tm = TrackMixDevice(alpha=0.5)
    x2, t2 = tm(jax.random.PRNGKey(1), jnp.asarray(x),
                {"adpit_label": jnp.asarray(lab)}, jnp.ones((B,), bool))
    out = np.asarray(t2["adpit_label"])
    assert out[:, :, 0].sum() == 0  # a0 cleared on collision frames
    assert (out[:, :, 1, 0, 0] > 0).all() and (out[:, :, 2, 0, 0] > 0).all()
    np.testing.assert_allclose(out[:, :, 1, 0, 0] + out[:, :, 2, 0, 0], 1.0,
                               atol=1e-5)


def test_trackmix_device_respects_ov_mask(rng):
    B = 4
    lab = np.zeros((B, 5, 6, 4, 2), np.float32)
    lab[:, :, 0, 0, 0] = 1.0
    x = rng.standard_normal((B, 7, 50, 8)).astype(np.float32)
    tm = TrackMixDevice(alpha=0.5)
    ov1 = jnp.asarray([False, False, False, False])
    x2, t2 = tm(jax.random.PRNGKey(2), jnp.asarray(x),
                {"adpit_label": jnp.asarray(lab)}, ov1)
    np.testing.assert_array_equal(np.asarray(x2), x)
    np.testing.assert_array_equal(np.asarray(t2["adpit_label"]), lab)


def test_rotation_device_channel_label_pairing(rng):
    B, T = 8, 5
    x = np.zeros((B, 4, 64), np.float32)
    for c in range(4):
        x[:, c] = c + 1
    doa = np.tile(np.asarray([1.0, 2.0, 3.0], np.float32), (B, T, 1, 1))
    rot = RotationDevice(p=1.0, rotation_type=48)
    x2, t2 = rot(jax.random.PRNGKey(3), jnp.asarray(x),
                 {"doa_label": jnp.asarray(doa)})
    x2 = np.asarray(x2)
    y = np.asarray(t2["doa_label"])
    # W unchanged; rotated channels are signed copies of Y/Z/X
    np.testing.assert_array_equal(x2[:, 0], x[:, 0])
    for b in range(B):
        chans = sorted(np.abs(x2[b, 1:, 0]).tolist())
        assert chans == [2.0, 3.0, 4.0]
        # label rotation preserves the norm and uses entries of (1,2,3)
        np.testing.assert_allclose(np.linalg.norm(y[b, 0, 0]),
                                   np.linalg.norm([1, 2, 3]), rtol=1e-6)
        assert sorted(np.abs(y[b, 0, 0]).tolist()) == [1.0, 2.0, 3.0]

    # consistency: waveform channel source perm implies the label perm.
    # rotated ch order (signy*x[s_x], signz*x[s_y], signx*x[s_z]) with
    # x values c+1 lets us recover s_*; labels use (xx,yy,zz) = the matching
    # key of the same transform table.
    from pseldnets_tpu.augment.rotate_device import _TRANS48

    inv = {v: k for k, v in _TRANS48.items()}
    for b in range(B):
        s = tuple(int(abs(x2[b, i, 0])) - 1 for i in (1, 2, 3))
        xx, yy, zz = inv[s]
        signs = (np.sign(x2[b, 3, 0]), np.sign(x2[b, 1, 0]), np.sign(x2[b, 2, 0]))
        expect = [signs[0] * (xx + 1), signs[1] * (yy + 1), signs[2] * (zz + 1)]
        np.testing.assert_allclose(y[b, 0, 0], expect, rtol=1e-6)
