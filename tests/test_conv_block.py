"""Fused conv3x3+bias+ReLU Pallas kernel (ops.pallas.conv_block) parity vs
the XLA conv the serving path uses (serving/crnn.py trunk loop)."""

import numpy as np
import jax
import jax.numpy as jnp

from pseldnets_tpu.ops.pallas.conv_block import conv3x3_bias_relu


def _xla_conv_relu(x, w, b):
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return jnp.maximum(y + b, 0.0)


def test_single_conv_parity():
    r = np.random.default_rng(0)
    B, T, F, Ci, Co = 2, 12, 8, 5, 16
    x = jnp.asarray(r.standard_normal((B, T, F, Ci)), jnp.float32)
    w = jnp.asarray(r.normal(0, 0.2, (3, 3, Ci, Co)), jnp.float32)
    b = jnp.asarray(r.normal(0, 0.2, (Co,)), jnp.float32)
    ref = np.asarray(_xla_conv_relu(x, w, b))
    got = np.asarray(conv3x3_bias_relu(x, w, b, t_blk=4,
                                       compute_dtype=jnp.float32,
                                       interpret=True))
    assert np.abs(got - ref).max() < 2e-5, np.abs(got - ref).max()


def test_double_conv_parity_and_edge_halo():
    """The fused ConvBlock pair must equal two XLA conv+relu passes — in
    particular at the FIRST/LAST time chunks, where conv2's halo is SAME-pad
    zeros, not conv1 evaluated past the image edge."""
    r = np.random.default_rng(1)
    B, T, F, Ci, Cm, Co = 2, 12, 8, 5, 16, 24
    x = jnp.asarray(r.standard_normal((B, T, F, Ci)), jnp.float32)
    w1 = jnp.asarray(r.normal(0, 0.2, (3, 3, Ci, Cm)), jnp.float32)
    b1 = jnp.asarray(r.normal(0, 0.5, (Cm,)), jnp.float32)  # big bias so a
    # wrong edge halo (relu(b1 + edge taps) != 0) would show loudly
    w2 = jnp.asarray(r.normal(0, 0.2, (3, 3, Cm, Co)), jnp.float32)
    b2 = jnp.asarray(r.normal(0, 0.2, (Co,)), jnp.float32)
    ref = np.asarray(_xla_conv_relu(_xla_conv_relu(x, w1, b1), w2, b2))
    for t_blk in (4, 12):
        got = np.asarray(conv3x3_bias_relu(x, w1, b1, w2, b2, t_blk=t_blk,
                                           compute_dtype=jnp.float32,
                                           interpret=True))
        assert np.abs(got - ref).max() < 5e-5, (t_blk,
                                                np.abs(got - ref).max())


def test_relu_conv_parity():
    """w=None mode: x is the RAW bias-free conv1 output and the kernel
    computes relu(conv3x3(relu(x + b1), w2) + b2) — the stem-block split
    (XLA conv1, fused rest) serving/crnn._conv_block uses for Cin=7."""
    r = np.random.default_rng(2)
    B, T, F, Ci, Cm, Co = 2, 12, 8, 7, 16, 24
    x = jnp.asarray(r.standard_normal((B, T, F, Ci)), jnp.float32)
    w1 = jnp.asarray(r.normal(0, 0.2, (3, 3, Ci, Cm)), jnp.float32)
    b1 = jnp.asarray(r.normal(0, 0.5, (Cm,)), jnp.float32)
    w2 = jnp.asarray(r.normal(0, 0.2, (3, 3, Cm, Co)), jnp.float32)
    b2 = jnp.asarray(r.normal(0, 0.2, (Co,)), jnp.float32)
    ref = np.asarray(_xla_conv_relu(_xla_conv_relu(x, w1, b1), w2, b2))
    raw = jax.lax.conv_general_dilated(
        x, w1, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    for t_blk in (4, 12):
        got = np.asarray(conv3x3_bias_relu(raw, None, b1, w2, b2,
                                           t_blk=t_blk,
                                           compute_dtype=jnp.float32,
                                           interpret=True))
        assert np.abs(got - ref).max() < 5e-5, (t_blk,
                                                np.abs(got - ref).max())


def test_t_blk_autopick():
    from pseldnets_tpu.ops.pallas.conv_block import _pick_t_blk

    assert _pick_t_blk(1001) == 91   # 7*13 — largest divisor <= 128
    assert _pick_t_blk(500) == 125
    assert _pick_t_blk(250) == 125
    assert _pick_t_blk(128) == 128
