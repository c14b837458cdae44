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
        # exp2-folded softmax + post-PV normalization: same math, fp-only dev
        got2 = np.asarray(swin_block_fused(x, vs["params"], H=H, W=W, nh=nh,
                                           window=w, shift=shift,
                                           compute_dtype=jnp.float32,
                                           attn_impl="exp2", interpret=True))
        assert np.abs(got2 - ref).max() < 5e-5
        # head-batched attention: heads on the dot_general batch dim —
        # bitwise-identical to the per-head loop (same dots, same order)
        got3 = np.asarray(swin_block_fused(x, vs["params"], H=H, W=W, nh=nh,
                                           window=w, shift=shift,
                                           compute_dtype=jnp.float32,
                                           attn_impl="batched",
                                           interpret=True))
        assert np.abs(got3 - got).max() == 0.0
        # per-head direct dots + proj folded into v (serving default for
        # nh<=4 stages via attn_impl="auto"; 1.14x at stage-0 production
        # shapes, scripts/perf_r5d_probe.py) — same math re-associated
        got4 = np.asarray(swin_block_fused(x, vs["params"], H=H, W=W, nh=nh,
                                           window=w, shift=shift,
                                           compute_dtype=jnp.float32,
                                           attn_impl="headdot",
                                           interpret=True))
        assert np.abs(got4 - ref).max() < 5e-5


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


def test_htsat_fused_forward_adapter_parity(rng):
    """AdapterBit-tuned checkpoints serve fused too: htsat_fused_forward
    routes blocks through the adapter eval kernel when the tree carries
    bottleneck adapters (constant scalar)."""
    import flax

    from pseldnets_tpu.models.adapters import AdaptConfig

    adapt = AdaptConfig({
        "method": "adapter",
        "adapt_kwargs": {"position": ["MlpAdapter", "SpatialAdapter"],
                         "type": "adapter", "mlp_ratio": 0.5,
                         "adapter_scalar": 0.1, "act_layer": "gelu"}})
    assert adapt.kernels_support()
    model = heads.HTSAT(
        num_classes=5, in_channels=7, mel_bins=16, num_tracks=3,
        tgt_output_frames=24, adapt=adapt,
        encoder_kwargs=(("spec_size", 64), ("patch_size", 4),
                        ("patch_stride", (4, 4)), ("embed_dim", 16),
                        ("depths", (2, 2)), ("num_heads", (2, 4)),
                        ("window_size", 4), ("mlp_ratio", 2.0),
                        ("drop_path_rate", 0.0)))
    x = jnp.asarray(rng.standard_normal((2, 7, 241, 16)).astype(np.float32) * 0.5)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    # randomize the zero-init adapter up-projections so wiring bugs show
    flat = flax.traverse_util.flatten_dict(variables["params"])
    for k in flat:
        if "adapter" in k:
            flat[k] = jnp.asarray(
                rng.standard_normal(flat[k].shape).astype(np.float32) * 0.3)
    variables = {"params": flax.traverse_util.unflatten_dict(flat),
                 "batch_stats": variables["batch_stats"]}
    ref = np.asarray(model.apply(variables, x, train=False)["multi_accdoa"])
    got = np.asarray(htsat_fused_forward(model, variables, x,
                                         compute_dtype=jnp.float32,
                                         interpret=True)["multi_accdoa"])
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() < 5e-5, np.abs(got - ref).max()


def test_htsat_patch_embed_einsum_equals_conv(rng):
    """patch_embed="einsum" (one row-major reshape + einsum replacing
    reshape_wav2img + the 4x4/4 conv — kills ~2.3 ms of layout copies at
    B=128, r5b HLO dump) must match the conv formulation to f32 accumulation
    noise; both stay available (conv is the generic fallback)."""
    model = _tiny_model()
    x = jnp.asarray(rng.standard_normal((2, 7, 241, 16)).astype(np.float32) * 0.5)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    outs = [np.asarray(htsat_fused_forward(
        model, variables, x, compute_dtype=jnp.float32, interpret=True,
        patch_embed=pe)["multi_accdoa"]) for pe in ("einsum", "conv")]
    assert np.abs(outs[0] - outs[1]).max() < 5e-5
    # the Pallas patch-embed kernel (documented on-chip loser, PERF.md r5e)
    # stays parity-pinned
    outk = np.asarray(htsat_fused_forward(
        model, variables, x, compute_dtype=jnp.float32, interpret=True,
        patch_embed="kernel")["multi_accdoa"])
    assert np.abs(outk - outs[1]).max() < 5e-5


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
                        out_specs=P("data"), check_vma=False)
    out = np.asarray(sharded(variables, x)["multi_accdoa"])
    np.testing.assert_allclose(out, single, atol=1e-5)


def _tiny_passt(num_tracks=1):
    return heads.PASST(
        num_classes=5, in_channels=7, mel_bins=16, num_tracks=num_tracks,
        encoder_kwargs=(("u_patchout", 0), ("s_patchout_t", 0),
                        ("s_patchout_f", 0), ("img_size", (16, 101)),
                        ("patch_size", 16), ("stride", 10),
                        ("embed_dim", 16), ("depth", 2), ("num_heads", 2),
                        ("mlp_ratio", 4.0), ("qkv_bias", True),
                        ("distilled", True), ("drop_rate", 0.0),
                        ("drop_path_rate", 0.0)))


def test_vit_block_kernel_parity(rng):
    from pseldnets_tpu.models.passt import Block
    from pseldnets_tpu.ops.pallas.vit_block import vit_block_fused

    N, C, nh = 26, 32, 4
    blk = Block(dim=C, num_heads=nh)
    x = jnp.asarray(rng.standard_normal((3, N, C)).astype(np.float32))
    vs = blk.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(blk.apply(vs, x))
    got = np.asarray(vit_block_fused(x, vs["params"], nh=nh,
                                     compute_dtype=jnp.float32,
                                     interpret=True))
    assert np.abs(got - ref).max() < 2e-5, np.abs(got - ref).max()
    # exp2 path: q-scale/log2e fold + per-head sum_pv ones-column splice +
    # nomax — same math re-associated (guards the hv=hd+1 slicing and the
    # wv2/bv2 concat, which would otherwise fail silently behind the flag)
    got2 = np.asarray(vit_block_fused(x, vs["params"], nh=nh,
                                      attn_impl="exp2",
                                      compute_dtype=jnp.float32,
                                      interpret=True))
    assert np.abs(got2 - ref).max() < 5e-5, np.abs(got2 - ref).max()
    # exp2 without sum_pv: post-PV divide by the bf16-consumed e's f32 sum
    got3 = np.asarray(vit_block_fused(x, vs["params"], nh=nh,
                                      attn_impl="exp2", sum_pv=False,
                                      compute_dtype=jnp.float32,
                                      interpret=True))
    assert np.abs(got3 - ref).max() < 5e-5, np.abs(got3 - ref).max()


def test_passt_fused_forward_parity(rng):
    from pseldnets_tpu.serving import passt_fused_forward

    model = _tiny_passt()
    x = jnp.asarray(rng.standard_normal((2, 7, 101, 16)).astype(np.float32) * 0.5)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    ref = np.asarray(model.apply(variables, x, train=False)["accdoa"])
    got = np.asarray(passt_fused_forward(model, variables, x,
                                         compute_dtype=jnp.float32,
                                         interpret=True)["accdoa"])
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() < 5e-5, np.abs(got - ref).max()


def test_einv2_htsat_fused_forward_parity(rng):
    from pseldnets_tpu.models import einv2_heads
    from pseldnets_tpu.serving import einv2_htsat_fused_forward

    model = einv2_heads.HTSAT(
        num_classes=5, in_channels=7, mel_bins=16, tgt_output_frames=24,
        encoder_kwargs=(("spec_size", 64), ("patch_size", 4),
                        ("patch_stride", (4, 4)), ("embed_dim", 16),
                        ("depths", (2, 2)), ("num_heads", (2, 4)),
                        ("window_size", 4), ("mlp_ratio", 2.0),
                        ("drop_path_rate", 0.0)))
    x = jnp.asarray(rng.standard_normal((2, 7, 241, 16)).astype(np.float32) * 0.5)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    ref = model.apply(variables, x, train=False)
    got = einv2_htsat_fused_forward(model, variables, x,
                                    compute_dtype=jnp.float32,
                                    interpret=True)
    for k in ("sed", "doa"):
        d = np.abs(np.asarray(got[k]) - np.asarray(ref[k])).max()
        assert d < 5e-5, (k, d)
    # merge_fold: PatchMerging inside the last block kernel of each stage
    got2 = einv2_htsat_fused_forward(model, variables, x,
                                     compute_dtype=jnp.float32,
                                     interpret=True, merge_fold=True)
    for k in ("sed", "doa"):
        d = np.abs(np.asarray(got2[k]) - np.asarray(ref[k])).max()
        assert d < 5e-5, (k, d)


def test_gelu_poly_accuracy():
    """The bf16-path polynomial GELU must stay within 1e-4 of exact GELU
    everywhere (fitted max err 5.2e-5 — two orders below bf16 rounding)."""
    from pseldnets_tpu.ops.pallas.swin_block import _gelu_poly

    x = jnp.asarray(np.linspace(-20, 20, 200001, dtype=np.float32))
    got = np.asarray(_gelu_poly(x))
    ref = np.asarray(jax.nn.gelu(x, approximate=False))
    assert np.abs(got - ref).max() < 1e-4, np.abs(got - ref).max()


def test_swin_stage_kernel_parity(rng):
    """swin_stage_fused == sequential SwinTransformerBlocks (shift 0, s)."""
    from pseldnets_tpu.models.htsat import SwinTransformerBlock
    from pseldnets_tpu.ops.pallas.swin_block import swin_stage_fused

    H = W = 16
    C, nh, w = 32, 4, 8
    x = jnp.asarray(rng.standard_normal((3, H * W, C)).astype(np.float32))
    blocks, params = [], []
    ref = x
    for j, shift in enumerate((0, 4, 0, 4)):
        blk = SwinTransformerBlock(dim=C, input_resolution=(H, W),
                                   num_heads=nh, window_size=w,
                                   shift_size=shift)
        vs = blk.init(jax.random.PRNGKey(j), ref)
        ref = blk.apply(vs, ref)
        params.append(vs["params"])
    got = np.asarray(swin_stage_fused(x, params, H=H, W=W, nh=nh, window=w,
                                      shifts=(0, 4, 0, 4),
                                      compute_dtype=jnp.float32,
                                      interpret=True))
    assert np.abs(got - np.asarray(ref)).max() < 5e-5, \
        np.abs(got - np.asarray(ref)).max()


def test_swin_stage_v2_kernel_parity(rng):
    """Grid-over-depth stage kernel == sequential flax blocks (carry via the
    revisited output block; shifted/unshifted bodies under pl.when)."""
    from pseldnets_tpu.models.htsat import SwinTransformerBlock
    from pseldnets_tpu.ops.pallas.swin_block import swin_stage_fused_v2

    H = W = 16
    C, nh, w = 32, 4, 8
    x = jnp.asarray(rng.standard_normal((3, H * W, C)).astype(np.float32))
    params = []
    ref = x
    for j, shift in enumerate((0, 4, 0, 4)):
        blk = SwinTransformerBlock(dim=C, input_resolution=(H, W),
                                   num_heads=nh, window_size=w,
                                   shift_size=shift)
        vs = blk.init(jax.random.PRNGKey(j), ref)
        ref = blk.apply(vs, ref)
        params.append(vs["params"])
    got = np.asarray(swin_stage_fused_v2(x, params, H=H, W=W, nh=nh,
                                         window=w, shifts=(0, 4, 0, 4),
                                         compute_dtype=jnp.float32,
                                         interpret=True))
    assert np.abs(got - np.asarray(ref)).max() < 5e-5, \
        np.abs(got - np.asarray(ref)).max()


def test_swin_stage_v2_no_shift(rng):
    """Clamped-window stages (all shifts 0) skip the pl.when branching."""
    from pseldnets_tpu.models.htsat import SwinTransformerBlock
    from pseldnets_tpu.ops.pallas.swin_block import swin_stage_fused_v2

    H = W = 8
    C, nh, w = 32, 4, 8
    x = jnp.asarray(rng.standard_normal((2, H * W, C)).astype(np.float32))
    params = []
    ref = x
    for j in range(2):
        blk = SwinTransformerBlock(dim=C, input_resolution=(H, W),
                                   num_heads=nh, window_size=w, shift_size=0)
        vs = blk.init(jax.random.PRNGKey(j), ref)
        ref = blk.apply(vs, ref)
        params.append(vs["params"])
    got = np.asarray(swin_stage_fused_v2(x, params, H=H, W=W, nh=nh,
                                         window=w, shifts=(0, 0),
                                         compute_dtype=jnp.float32,
                                         interpret=True))
    assert np.abs(got - np.asarray(ref)).max() < 5e-5


def test_crnn_fused_forward_parity(rng):
    """crnn_fused_forward (folded BNs, slice pooling, flattened conformer,
    interp+mean matrix) == flax CRNN.apply eval, f32."""
    from pseldnets_tpu.serving import crnn_fused_forward

    for tracks, pool, barrier in ((1, "slice", True), (3, "avg", False)):
        model = heads.CRNN(num_classes=4, in_channels=7, encoder="CNN8",
                           num_features=(8, 16, 16, 24), decoder="conformer",
                           num_decoder_layers=1, mel_bins=16, pred_res=10,
                           num_tracks=tracks)
        x = jnp.asarray(rng.standard_normal((2, 7, 80, 16)).astype(np.float32))
        vs = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        ref = np.asarray(model.apply(vs, x, train=False)[model.output_key])
        got = np.asarray(crnn_fused_forward(
            model, vs, x, compute_dtype=jnp.float32, pool=pool,
            ffn_barrier=barrier)[model.output_key])
        assert got.shape == ref.shape
        dev = np.abs(got - ref).max()
        assert dev < 5e-5, dev
        # conv_out="compute" at f32 compute dtype is the identical graph
        # (cd == f32); guards the knob's wiring (measured a wash on-chip
        # at bf16, default stays "f32" — docs/PERF.md round 4)
        got2 = np.asarray(crnn_fused_forward(
            model, vs, x, compute_dtype=jnp.float32, pool=pool,
            ffn_barrier=barrier, conv_out="compute")[model.output_key])
        np.testing.assert_array_equal(got2, got)
        # and at bf16 it must stay within the bf16 accumulation band
        got3 = np.asarray(crnn_fused_forward(
            model, vs, x, compute_dtype=jnp.bfloat16, pool=pool,
            ffn_barrier=barrier, conv_out="compute")[model.output_key])
        assert np.isfinite(got3).all()
        assert np.abs(got3 - ref).max() < 5e-2, np.abs(got3 - ref).max()
        # fused Pallas double-conv trunk (conv_impl="pallas"): bias+ReLU and
        # the mid activation stay in VMEM (ops.pallas.conv_block)
        got4 = np.asarray(crnn_fused_forward(
            model, vs, x, compute_dtype=jnp.float32, pool=pool,
            ffn_barrier=barrier, conv_impl="pallas",
            interpret=True)[model.output_key])
        assert np.abs(got4 - ref).max() < 5e-5, np.abs(got4 - ref).max()


def test_htsat_fused_forward_from_wav_parity(rng):
    """htsat_fused_forward_from_wav (ScalarBN + frame-pad folded into the
    frontend kernel) == pallas extractor -> flax model.apply eval, f32;
    wav_scale must equal scaling the waveform."""
    import flax

    from pseldnets_tpu.ops.pallas.frontend import fused_logmel_iv
    from pseldnets_tpu.serving import htsat_fused_forward_from_wav

    model = _tiny_model()
    wav = jnp.asarray(rng.standard_normal((2, 4, 57600)).astype(np.float32)
                      * 0.1)
    fe = dict(n_mels=16, t_blk=32)
    feats = fused_logmel_iv(wav, split3=True, interpret=True, **fe)
    variables = flax.core.unfreeze(
        model.init({"params": jax.random.PRNGKey(0)}, feats, train=False))
    # non-trivial running stats so the folded affine is exercised
    bn = variables["batch_stats"]["scalar"]["bn"]
    bn["running_mean"] = jnp.asarray(
        rng.standard_normal(bn["running_mean"].shape).astype(np.float32) * 0.5)
    bn["running_var"] = jnp.asarray(
        (rng.random(bn["running_var"].shape) + 0.5).astype(np.float32))

    ref = np.asarray(model.apply(variables, feats,
                                 train=False)["multi_accdoa"])
    got = np.asarray(htsat_fused_forward_from_wav(
        model, variables, wav, compute_dtype=jnp.float32, interpret=True,
        **fe)["multi_accdoa"])
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() < 5e-5, np.abs(got - ref).max()

    a = np.asarray(htsat_fused_forward_from_wav(
        model, variables, wav * 1.25, compute_dtype=jnp.float32,
        interpret=True, **fe)["multi_accdoa"])
    b = np.asarray(htsat_fused_forward_from_wav(
        model, variables, wav, wav_scale=jnp.float32(1.25),
        compute_dtype=jnp.float32, interpret=True, **fe)["multi_accdoa"])
    np.testing.assert_allclose(a, b, atol=2e-6)


def test_passt_crnn_fused_forward_from_wav_parity(rng):
    """passt/crnn _from_wav (ScalarBN folded into the frontend kernel) ==
    pallas extractor -> fused forward with in-graph ScalarBN, f32."""
    import flax

    from pseldnets_tpu.ops.pallas.frontend import fused_logmel_iv
    from pseldnets_tpu.serving import (crnn_fused_forward,
                                       crnn_fused_forward_from_wav,
                                       passt_fused_forward,
                                       passt_fused_forward_from_wav)

    fe = dict(n_mels=16, t_blk=32)

    def randomize_bn(variables):
        vs = flax.core.unfreeze(variables)
        bn = vs["batch_stats"]["scalar"]["bn"]
        bn["running_mean"] = jnp.asarray(
            rng.standard_normal(bn["running_mean"].shape).astype(np.float32)
            * 0.5)
        bn["running_var"] = jnp.asarray(
            (rng.random(bn["running_var"].shape) + 0.5).astype(np.float32))
        return vs

    # PaSST: 101 frames <- 24000 samples @ hop 240
    model = _tiny_passt()
    wav = jnp.asarray(rng.standard_normal((2, 4, 24000)).astype(np.float32)
                      * 0.1)
    feats = fused_logmel_iv(wav, split3=True, interpret=True, **fe)
    vs = randomize_bn(model.init({"params": jax.random.PRNGKey(0)}, feats,
                                 train=False))
    ref = np.asarray(passt_fused_forward(model, vs, feats,
                                         compute_dtype=jnp.float32,
                                         interpret=True)["accdoa"])
    got = np.asarray(passt_fused_forward_from_wav(
        model, vs, wav, compute_dtype=jnp.float32, interpret=True,
        **fe)["accdoa"])
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() < 5e-5, np.abs(got - ref).max()

    # CRNN: 80 frames <- 18960 samples @ hop 240
    model = heads.CRNN(num_classes=4, in_channels=7, encoder="CNN8",
                       num_features=(8, 16, 16, 24), decoder="conformer",
                       num_decoder_layers=1, mel_bins=16, pred_res=10,
                       num_tracks=1)
    wav = jnp.asarray(rng.standard_normal((2, 4, 18960)).astype(np.float32)
                      * 0.1)
    feats = fused_logmel_iv(wav, split3=True, interpret=True, **fe)
    vs = randomize_bn(model.init({"params": jax.random.PRNGKey(0)}, feats,
                                 train=False))
    ref = np.asarray(crnn_fused_forward(model, vs, feats,
                                        compute_dtype=jnp.float32)
                     [model.output_key])
    got = np.asarray(crnn_fused_forward_from_wav(
        model, vs, wav, compute_dtype=jnp.float32, interpret=True,
        **fe)[model.output_key])
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() < 5e-5, np.abs(got - ref).max()


def test_htsat_fused_forward_merge_fold_parity(rng):
    """merge_fold=True (PatchMerging inside the stage's last block kernel)
    == the XLA-merge fused forward, f32 interpret."""
    model = _tiny_model()
    x = jnp.asarray(rng.standard_normal((2, 7, 241, 16)).astype(np.float32)
                    * 0.5)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    ref = np.asarray(htsat_fused_forward(model, variables, x,
                                         compute_dtype=jnp.float32,
                                         interpret=True)["multi_accdoa"])
    got = np.asarray(htsat_fused_forward(model, variables, x,
                                         compute_dtype=jnp.float32,
                                         interpret=True,
                                         merge_fold=True)["multi_accdoa"])
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() < 2e-6, np.abs(got - ref).max()
