"""Fused-kernel serving path: htsat_fused_forward (Pallas Swin blocks,
interpret mode here) must equal model.apply eval output bit-near-exactly."""

import numpy as np
import jax
import jax.numpy as jnp

from pseldnets_tpu.models import heads
from pseldnets_tpu.ops.pallas.swin_block import swin_block_fused
from pseldnets_tpu.serving import htsat_fused_forward


def _tiny_model(num_tracks=3):
    return heads.HTSAT(
        num_classes=5, in_channels=7, mel_bins=16, num_tracks=num_tracks,
        tgt_output_frames=24,
        encoder_kwargs=(("spec_size", 64), ("patch_size", 4),
                        ("patch_stride", (4, 4)), ("embed_dim", 16),
                        ("depths", (2, 2)), ("num_heads", (2, 4)),
                        ("window_size", 4), ("mlp_ratio", 2.0),
                        ("drop_path_rate", 0.0)))


def test_swin_block_kernel_parity(rng):
    from pseldnets_tpu.models.htsat import SwinTransformerBlock

    H = W = 16
    C, nh, w = 32, 4, 8
    for shift in (0, 4):
        blk = SwinTransformerBlock(dim=C, input_resolution=(H, W),
                                   num_heads=nh, window_size=w,
                                   shift_size=shift)
        x = jnp.asarray(rng.standard_normal((3, H * W, C)).astype(np.float32))
        vs = blk.init(jax.random.PRNGKey(0), x)
        ref = np.asarray(blk.apply(vs, x))
        got = np.asarray(swin_block_fused(x, vs["params"], H=H, W=W, nh=nh,
                                          window=w, shift=shift,
                                          compute_dtype=jnp.float32,
                                          interpret=True))
        assert np.abs(got - ref).max() < 2e-5


def test_htsat_fused_forward_parity(rng):
    model = _tiny_model()
    x = jnp.asarray(rng.standard_normal((2, 7, 241, 16)).astype(np.float32) * 0.5)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    ref = np.asarray(model.apply(variables, x, train=False)["multi_accdoa"])
    got = np.asarray(htsat_fused_forward(model, variables, x,
                                         compute_dtype=jnp.float32,
                                         interpret=True)["multi_accdoa"])
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() < 5e-5, np.abs(got - ref).max()


def test_htsat_fused_forward_5s_trick(rng):
    model = _tiny_model(num_tracks=1)
    x = jnp.asarray(rng.standard_normal((4, 7, 121, 16)).astype(np.float32) * 0.5)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    ref = np.asarray(model.apply(variables, x, train=False)["accdoa"])
    got = np.asarray(htsat_fused_forward(model, variables, x,
                                         compute_dtype=jnp.float32,
                                         interpret=True)["accdoa"])
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() < 5e-5, np.abs(got - ref).max()


def test_htsat_fused_forward_shard_map(rng):
    """Multi-chip serving: shard_map over an 8-device mesh runs the fused
    forward per shard and matches the single-device result."""
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    model = _tiny_model()
    x = jnp.asarray(rng.standard_normal((8, 7, 241, 16)).astype(np.float32) * 0.5)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)

    single = np.asarray(htsat_fused_forward(model, variables, x,
                                            compute_dtype=jnp.float32,
                                            interpret=True)["multi_accdoa"])

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    fwd = lambda v, f: htsat_fused_forward(  # noqa: E731
        model, v, f, compute_dtype=jnp.float32, interpret=True)
    sharded = shard_map(fwd, mesh=mesh, in_specs=(P(), P("data")),
                        out_specs=P("data"), check_rep=False)
    out = np.asarray(sharded(variables, x)["multi_accdoa"])
    np.testing.assert_allclose(out, single, atol=1e-5)
