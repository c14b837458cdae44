"""Fused Swin-block custom VJP: gradients from the hand-written Pallas
backward kernel (interpret mode) must match jax.grad of (a) the flax block at
drop-path masks = 1 and (b) a pure-jnp mirror of the block math at random
masks."""

import numpy as np
import jax
import jax.numpy as jnp

from pseldnets_tpu.models.htsat import SwinTransformerBlock
from pseldnets_tpu.ops.pallas.swin_block import _gelu_exact
from pseldnets_tpu.ops.pallas.swin_block_vjp import (_ln_fwd, _partition,
                                                     _reverse,
                                                     swin_block_train)

H = W = 16
C, NH, WIN = 32, 4, 8


def _ref_forward(p, x, masks, shift):
    """Pure-jnp mirror of the fused block (per-image loop)."""
    from pseldnets_tpu.models.htsat import (relative_position_index,
                                            shift_attn_mask)

    def dense(d):
        return d["base"] if "base" in d else d

    N = WIN * WIN
    idx = relative_position_index(WIN).reshape(-1)
    table = p["attn"]["relative_position_bias_table"]
    bias = table[idx].reshape(N, N, NH).transpose(2, 0, 1)
    amask = (jnp.asarray(shift_attn_mask(H, W, WIN, shift))
             if shift else None)
    hd = C // NH
    outs = []
    for b in range(x.shape[0]):
        x0 = x[b]
        xhat1, _ = _ln_fwd(x0)
        h = xhat1 * p["norm1"]["scale"] + p["norm1"]["bias"]
        img = h.reshape(H, W, C)
        if shift:
            img = jnp.roll(img, (-shift, -shift), (0, 1))
        win = _partition(img, H, W, WIN, C)
        qkv = win @ dense(p["attn"]["qkv"])["kernel"] + \
            dense(p["attn"]["qkv"])["bias"]
        heads = []
        for hh in range(NH):
            q = qkv[:, hh * hd:(hh + 1) * hd].reshape(-1, N, hd)
            k = qkv[:, C + hh * hd: C + (hh + 1) * hd].reshape(-1, N, hd)
            v = qkv[:, 2 * C + hh * hd: 2 * C + (hh + 1) * hd].reshape(-1, N, hd)
            s = jnp.einsum("wnd,wmd->wnm", q * (hd ** -0.5), k) + bias[hh][None]
            if amask is not None:
                s = s + amask
            pr = jax.nn.softmax(s, axis=-1)
            heads.append(jnp.einsum("wnm,wmd->wnd", pr, v).reshape(-1, hd))
        attn = jnp.concatenate(heads, axis=-1)
        a = attn @ dense(p["attn"]["proj"])["kernel"] + \
            dense(p["attn"]["proj"])["bias"]
        img2 = _reverse(a, H, W, WIN, C)
        if shift:
            img2 = jnp.roll(img2, (shift, shift), (0, 1))
        y = x0 + masks[b, 0] * img2.reshape(H * W, C)
        yhat2, _ = _ln_fwd(y)
        h2 = yhat2 * p["norm2"]["scale"] + p["norm2"]["bias"]
        f = _gelu_exact(h2 @ dense(p["mlp"]["fc1"])["kernel"]
                        + dense(p["mlp"]["fc1"])["bias"])
        f = f @ dense(p["mlp"]["fc2"])["kernel"] + dense(p["mlp"]["fc2"])["bias"]
        outs.append(y + masks[b, 1] * f)
    return jnp.stack(outs)


def _assert_tree_close(a, b, rtol, atol):
    import flax

    fa = flax.traverse_util.flatten_dict(a)
    fb = flax.traverse_util.flatten_dict(b)
    assert set(fa) == set(fb)
    for k in fa:
        np.testing.assert_allclose(np.asarray(fa[k]), np.asarray(fb[k]),
                                   rtol=rtol, atol=atol,
                                   err_msg="/".join(map(str, k)))


def _grads(fn, p, x):
    def loss(p, x):
        o = fn(p, x)
        return jnp.sum(o * (1.0 + 0.1 * jnp.arange(C)))

    (dp, dx) = jax.grad(loss, argnums=(0, 1))(p, x)
    return dp, dx


def test_vjp_matches_flax_at_unit_masks(rng):
    for shift in (0, 4):
        blk = SwinTransformerBlock(dim=C, input_resolution=(H, W),
                                   num_heads=NH, window_size=WIN,
                                   shift_size=shift)
        x = jnp.asarray(rng.standard_normal((2, H * W, C)).astype(np.float32))
        vs = blk.init(jax.random.PRNGKey(0), x)
        masks = jnp.ones((2, 2), jnp.float32)

        dp_ref, dx_ref = _grads(lambda p, x: blk.apply({"params": p}, x),
                                vs["params"], x)
        dp_got, dx_got = _grads(
            lambda p, x: swin_block_train(x, p, masks, H, W, NH, WIN, shift,
                                          jnp.float32, True),
            vs["params"], x)
        np.testing.assert_allclose(np.asarray(dx_got), np.asarray(dx_ref),
                                   rtol=2e-4, atol=2e-4)
        _assert_tree_close(dp_got, dp_ref, rtol=2e-4, atol=2e-4)


def test_vjp_matches_jnp_ref_at_random_masks(rng):
    shift = 4
    blk = SwinTransformerBlock(dim=C, input_resolution=(H, W), num_heads=NH,
                               window_size=WIN, shift_size=shift)
    x = jnp.asarray(rng.standard_normal((4, H * W, C)).astype(np.float32))
    vs = blk.init(jax.random.PRNGKey(0), x)
    masks = jnp.asarray(
        (rng.random((4, 2)) > 0.3).astype(np.float32) / 0.9)

    out_ref = _ref_forward(vs["params"], x, masks, shift)
    out_got = swin_block_train(x, vs["params"], masks, H, W, NH, WIN, shift,
                               jnp.float32, True)
    np.testing.assert_allclose(np.asarray(out_got), np.asarray(out_ref),
                               rtol=1e-5, atol=1e-5)

    dp_ref, dx_ref = _grads(lambda p, x: _ref_forward(p, x, masks, shift),
                            vs["params"], x)
    dp_got, dx_got = _grads(
        lambda p, x: swin_block_train(x, p, masks, H, W, NH, WIN, shift,
                                      jnp.float32, True),
        vs["params"], x)
    np.testing.assert_allclose(np.asarray(dx_got), np.asarray(dx_ref),
                               rtol=2e-4, atol=2e-4)
    _assert_tree_close(dp_got, dp_ref, rtol=2e-4, atol=2e-4)
