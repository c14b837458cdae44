"""Adapter-fused Swin-block custom VJP (ops.pallas.swin_block_adapt_vjp):
forward and gradients from the hand-written backward kernel (interpret mode)
must match jax.grad of the flax block with bottleneck adapters enabled
(reference AdapterBit config: MlpAdapter + SpatialAdapter, constant scalar),
and a pure-jnp mirror at random drop-path masks."""

import numpy as np
import jax
import jax.numpy as jnp

from pseldnets_tpu.models.adapters import AdaptConfig
from pseldnets_tpu.models.htsat import SwinTransformerBlock
from pseldnets_tpu.ops.pallas.swin_block import _gelu_exact
from pseldnets_tpu.ops.pallas.swin_block_adapt_vjp import \
    swin_block_train_adapt
from pseldnets_tpu.ops.pallas.swin_block_vjp import (_ln_fwd, _partition,
                                                     _reverse)

H = W = 16
C, NH, WIN = 32, 4, 8
SCALE = 0.1


def _adapt(positions):
    return AdaptConfig({
        "method": "adapter",
        "adapt_kwargs": {"position": list(positions), "type": "adapter",
                         "mlp_ratio": 0.5, "adapter_scalar": SCALE,
                         "act_layer": "gelu"}})


def _randomize_adapters(params, rng):
    """Zero-init adapter fc2 kernels would hide wiring bugs (their grads
    gate everything upstream) — fill every adapter leaf with random values."""
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    for k in flat:
        if "adapter" in k:
            flat[k] = jnp.asarray(
                rng.standard_normal(flat[k].shape).astype(np.float32) * 0.3)
    return flax.traverse_util.unflatten_dict(flat)


def _assert_tree_close(a, b, rtol, atol):
    import flax

    fa = flax.traverse_util.flatten_dict(a)
    fb = flax.traverse_util.flatten_dict(b)
    assert set(fa) == set(fb), (sorted(fa)[:4], sorted(fb)[:4])
    for k in fa:
        np.testing.assert_allclose(np.asarray(fa[k]), np.asarray(fb[k]),
                                   rtol=rtol, atol=atol,
                                   err_msg="/".join(map(str, k)))


def _grads(fn, p, x):
    def loss(p, x):
        o = fn(p, x)
        return jnp.sum(o * (1.0 + 0.1 * jnp.arange(C)))

    return jax.grad(loss, argnums=(0, 1))(p, x)


def test_adapt_vjp_matches_flax_both_positions(rng):
    for shift in (0, 4):
        blk = SwinTransformerBlock(dim=C, input_resolution=(H, W),
                                   num_heads=NH, window_size=WIN,
                                   shift_size=shift,
                                   adapt=_adapt(["MlpAdapter",
                                                 "SpatialAdapter"]))
        x = jnp.asarray(rng.standard_normal((2, H * W, C)).astype(np.float32))
        p = _randomize_adapters(
            blk.init(jax.random.PRNGKey(0), x)["params"], rng)
        assert "adapter" in p["attn"] and "adapter" in p["mlp"]
        masks = jnp.ones((2, 2), jnp.float32)

        out_ref = blk.apply({"params": p}, x)
        out_got = swin_block_train_adapt(x, p, masks, H, W, NH, WIN, shift,
                                         SCALE, jnp.float32, True)
        np.testing.assert_allclose(np.asarray(out_got), np.asarray(out_ref),
                                   rtol=2e-5, atol=2e-5)

        dp_ref, dx_ref = _grads(lambda p, x: blk.apply({"params": p}, x),
                                p, x)
        dp_got, dx_got = _grads(
            lambda p, x: swin_block_train_adapt(x, p, masks, H, W, NH, WIN,
                                                shift, SCALE, jnp.float32,
                                                True), p, x)
        np.testing.assert_allclose(np.asarray(dx_got), np.asarray(dx_ref),
                                   rtol=2e-4, atol=2e-4)
        _assert_tree_close(dp_got, dp_ref, rtol=2e-4, atol=2e-4)


def test_adapt_vjp_single_position(rng):
    """MlpAdapter-only tree: the spatial slot runs zero-filled (exact no-op)
    and the grad tree carries no spurious attn.adapter entry."""
    blk = SwinTransformerBlock(dim=C, input_resolution=(H, W), num_heads=NH,
                               window_size=WIN, shift_size=0,
                               adapt=_adapt(["MlpAdapter"]))
    x = jnp.asarray(rng.standard_normal((2, H * W, C)).astype(np.float32))
    p = _randomize_adapters(blk.init(jax.random.PRNGKey(0), x)["params"], rng)
    assert "adapter" not in p["attn"] and "adapter" in p["mlp"]
    masks = jnp.ones((2, 2), jnp.float32)

    out_ref = blk.apply({"params": p}, x)
    out_got = swin_block_train_adapt(x, p, masks, H, W, NH, WIN, 0,
                                     SCALE, jnp.float32, True)
    np.testing.assert_allclose(np.asarray(out_got), np.asarray(out_ref),
                               rtol=2e-5, atol=2e-5)
    dp_ref, _ = _grads(lambda p, x: blk.apply({"params": p}, x), p, x)
    dp_got, _ = _grads(
        lambda p, x: swin_block_train_adapt(x, p, masks, H, W, NH, WIN, 0,
                                            SCALE, jnp.float32, True), p, x)
    _assert_tree_close(dp_got, dp_ref, rtol=2e-4, atol=2e-4)


def _ref_forward_adapt(p, x, masks, shift):
    """Pure-jnp mirror of the adapter block (per-image loop)."""
    from pseldnets_tpu.models.htsat import (relative_position_index,
                                            shift_attn_mask)

    def dense(d):
        return d["base"] if "base" in d else d

    def adapter(sub, v):
        h = _gelu_exact(v @ sub["fc1"]["kernel"] + sub["fc1"]["bias"])
        return SCALE * (h @ sub["fc2"]["kernel"] + sub["fc2"]["bias"])

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
        a = a + adapter(p["attn"]["adapter"], a)
        img2 = _reverse(a, H, W, WIN, C)
        if shift:
            img2 = jnp.roll(img2, (shift, shift), (0, 1))
        y = x0 + masks[b, 0] * img2.reshape(H * W, C)
        yhat2, _ = _ln_fwd(y)
        h2 = yhat2 * p["norm2"]["scale"] + p["norm2"]["bias"]
        f = _gelu_exact(h2 @ dense(p["mlp"]["fc1"])["kernel"]
                        + dense(p["mlp"]["fc1"])["bias"])
        f = f @ dense(p["mlp"]["fc2"])["kernel"] + dense(p["mlp"]["fc2"])["bias"]
        f = f + adapter(p["mlp"]["adapter"], h2)
        outs.append(y + masks[b, 1] * f)
    return jnp.stack(outs)


def test_adapt_vjp_random_masks(rng):
    """Drop-path masks gate the adapters too (they live INSIDE the branches:
    reference htsat.py:142-143, model_utilities.py:160-170)."""
    shift = 4
    blk = SwinTransformerBlock(dim=C, input_resolution=(H, W), num_heads=NH,
                               window_size=WIN, shift_size=shift,
                               adapt=_adapt(["MlpAdapter", "SpatialAdapter"]))
    x = jnp.asarray(rng.standard_normal((4, H * W, C)).astype(np.float32))
    p = _randomize_adapters(blk.init(jax.random.PRNGKey(0), x)["params"], rng)
    masks = jnp.asarray((rng.random((4, 2)) > 0.3).astype(np.float32) / 0.9)

    out_ref = _ref_forward_adapt(p, x, masks, shift)
    out_got = swin_block_train_adapt(x, p, masks, H, W, NH, WIN, shift,
                                     SCALE, jnp.float32, True)
    np.testing.assert_allclose(np.asarray(out_got), np.asarray(out_ref),
                               rtol=1e-5, atol=1e-5)

    dp_ref, dx_ref = _grads(lambda p, x: _ref_forward_adapt(p, x, masks,
                                                            shift), p, x)
    dp_got, dx_got = _grads(
        lambda p, x: swin_block_train_adapt(x, p, masks, H, W, NH, WIN, shift,
                                            SCALE, jnp.float32, True), p, x)
    np.testing.assert_allclose(np.asarray(dx_got), np.asarray(dx_ref),
                               rtol=2e-4, atol=2e-4)
    _assert_tree_close(dp_got, dp_ref, rtol=2e-4, atol=2e-4)
