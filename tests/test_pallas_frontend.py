"""Fused Pallas logmel+IV kernel: interpret-mode parity with the reference
feature chain (the compiled kernel is exercised on real TPU by
scripts/pallas_frontend_tpu.py)."""

import numpy as np
import jax.numpy as jnp

from pseldnets_tpu.ops import LogmelIVExtractor
from pseldnets_tpu.ops.pallas.frontend import fused_logmel_iv

CFG = {"data": {"sample_rate": 24000, "nfft": 1024, "n_mels": 64,
                "hoplen": 240, "window": "hann"}}


def test_fused_frontend_interpret_parity(rng):
    x = rng.standard_normal((2, 4, 24000)).astype(np.float32) * 0.2
    ref = np.asarray(LogmelIVExtractor(CFG)(jnp.asarray(x)))
    got = np.asarray(fused_logmel_iv(jnp.asarray(x), t_blk=32, interpret=True))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got[:, :4], ref[:, :4], atol=5e-4)  # logmel (dB)
    np.testing.assert_allclose(got[:, 4:], ref[:, 4:], atol=1e-5)  # IV


def test_fused_frontend_nondivisible_frames(rng):
    # 10 s @ 24 kHz -> 1001 frames, not a multiple of t_blk: tail must be
    # computed on zero-padding and cropped
    x = rng.standard_normal((1, 4, 240000)).astype(np.float32) * 0.1
    ref = np.asarray(LogmelIVExtractor(CFG)(jnp.asarray(x)))
    got = np.asarray(fused_logmel_iv(jnp.asarray(x), t_blk=128, interpret=True))
    assert got.shape == (1, 7, 1001, 64)
    np.testing.assert_allclose(got, ref, atol=5e-4)


def test_fused_frontend_variants(rng):
    """All four kernel configurations (flat/radix2 x f32/split3) agree with
    the reference chain; split3 within its documented dB budget."""
    x = rng.standard_normal((1, 4, 24000)).astype(np.float32) * 0.2
    ref = np.asarray(LogmelIVExtractor(CFG)(jnp.asarray(x)))
    for radix2 in (False, True):
        for split3 in (False, True):
            got = np.asarray(fused_logmel_iv(jnp.asarray(x), t_blk=32,
                                             interpret=True, split3=split3,
                                             radix2=radix2))
            np.testing.assert_allclose(got[:, :4], ref[:, :4], atol=5e-3,
                                       err_msg=f"r2={radix2} s3={split3}")
            np.testing.assert_allclose(got[:, 4:], ref[:, 4:], atol=1e-4,
                                       err_msg=f"r2={radix2} s3={split3}")


def test_fused_frontend_pack_and_rsqrt_variants(rng):
    """Round-3 VPU levers: lane-packed radix-2 halves (pack=True) and the
    exact rsqrt IV normalization must stay inside the same parity budget —
    iv_norm='rsqrt' is an algebraic identity, so it gets the TIGHT
    tolerance; pack only reorders lanes, so it must match its unpacked
    counterpart almost exactly."""
    x = rng.standard_normal((1, 4, 24000)).astype(np.float32) * 0.2
    ref = np.asarray(LogmelIVExtractor(CFG)(jnp.asarray(x)))
    for split3 in (False, True):
        base = np.asarray(fused_logmel_iv(jnp.asarray(x), t_blk=32,
                                          interpret=True, split3=split3,
                                          radix2=True))
        for pack in (False, True):
            for iv_norm in ("exact", "rsqrt"):
                got = np.asarray(fused_logmel_iv(
                    jnp.asarray(x), t_blk=32, interpret=True, split3=split3,
                    radix2=True, pack=pack, iv_norm=iv_norm))
                tag = f"s3={split3} pack={pack} iv={iv_norm}"
                np.testing.assert_allclose(got[:, :4], ref[:, :4], atol=5e-3,
                                           err_msg=tag)
                np.testing.assert_allclose(got[:, 4:], ref[:, 4:], atol=1e-4,
                                           err_msg=tag)
                # vs the measured production baseline: tiny numerical drift
                np.testing.assert_allclose(got, base, atol=2e-5, err_msg=tag)


def test_fused_frontend_stride_prep_identical(rng):
    """prep='stride' is a pure layout-op change — bit-identical output."""
    x = rng.standard_normal((1, 4, 24000)).astype(np.float32) * 0.2
    a = np.asarray(fused_logmel_iv(jnp.asarray(x), t_blk=32, interpret=True,
                                   split3=True))
    b = np.asarray(fused_logmel_iv(jnp.asarray(x), t_blk=32, interpret=True,
                                   split3=True, prep="stride"))
    np.testing.assert_array_equal(a, b)


def test_fused_frontend_lane_trim(rng):
    """Lane-trim (drop the zero-weight DC/Nyquist bins, remap bin hf/2 into
    the dead column: 2*nfh 514 -> 512, MXU-tile aligned) matches the
    untrimmed kernel within accumulation-order noise, incl. the production
    split3 config and a non-divisible nfft/hop pair."""
    x = rng.standard_normal((1, 4, 24000)).astype(np.float32) * 0.2
    for split3 in (False, True):
        a = np.asarray(fused_logmel_iv(jnp.asarray(x), t_blk=32,
                                       interpret=True, split3=split3,
                                       trim=False))
        b = np.asarray(fused_logmel_iv(jnp.asarray(x), t_blk=32,
                                       interpret=True, split3=split3))
        np.testing.assert_allclose(a, b, atol=1e-4,
                                   err_msg=f"split3={split3}")
    a = np.asarray(fused_logmel_iv(jnp.asarray(x), t_blk=32, interpret=True,
                                   n_fft=512, hop=100, trim=False))
    b = np.asarray(fused_logmel_iv(jnp.asarray(x), t_blk=32, interpret=True,
                                   n_fft=512, hop=100))
    # rtol covers seed-dependent accumulation-order noise on large-|dB| bins
    # (observed 2.8e-4 abs at 5.7e-6 rel on one element of 108k)
    np.testing.assert_allclose(a, b, atol=2e-4, rtol=2e-5)


def test_fused_frontend_dif_variant(rng):
    """Radix-2 DIF (sum/diff streams + exact 3-tap frequency-domain window)
    matches the reference chain for hann and hamming, f32 and split3, and at
    a non-divisible nfft/hop pair."""
    x = rng.standard_normal((1, 4, 24000)).astype(np.float32) * 0.2
    for window in ("hann", "hamming"):
        cfg = {"data": dict(CFG["data"], window=window)}
        ref = np.asarray(LogmelIVExtractor(cfg)(jnp.asarray(x)))
        for split3 in (False, True):
            got = np.asarray(fused_logmel_iv(
                jnp.asarray(x), t_blk=32, interpret=True, window=window,
                variant="dif", split3=split3))
            np.testing.assert_allclose(got[:, :4], ref[:, :4], atol=5e-3,
                                       err_msg=f"{window} s3={split3}")
            np.testing.assert_allclose(got[:, 4:], ref[:, 4:], atol=1e-4,
                                       err_msg=f"{window} s3={split3}")
    # hf (=256) not a multiple of hh (=50): padded last part + moff=2 bounds
    a = np.asarray(fused_logmel_iv(jnp.asarray(x), t_blk=32, interpret=True,
                                   variant="dif", n_fft=512, hop=100))
    b = np.asarray(fused_logmel_iv(jnp.asarray(x), t_blk=32, interpret=True,
                                   radix2=False, n_fft=512, hop=100))
    np.testing.assert_allclose(a, b, atol=5e-4)


def test_fused_frontend_serving_folds(rng):
    """Serving-path folds: pre_scale equals scaling the waveform, the
    in-kernel post_affine equals the XLA affine over the features,
    full_frames returns the padded frame count with a zeroed tail, and the
    bf16 out_dtype is the plain cast of the f32 output."""
    x = rng.standard_normal((2, 4, 24000)).astype(np.float32) * 0.2
    base = np.asarray(fused_logmel_iv(jnp.asarray(x), t_blk=32,
                                      interpret=True, split3=True))

    # pre_scale == scaling the signal (exact: same concatenate, same kernel)
    a = np.asarray(fused_logmel_iv(jnp.asarray(x * 1.3), t_blk=32,
                                   interpret=True, split3=True))
    b = np.asarray(fused_logmel_iv(jnp.asarray(x), t_blk=32, interpret=True,
                                   split3=True,
                                   pre_scale=jnp.float32(1.3)))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)

    # pre_scale_head: scale touches ONLY the n_fft/2-sample reflect head —
    # scale=1 is bit-identical, scale!=1 perturbs exactly the frames whose
    # window overlaps the head (f*hop < n_fft/2 -> f < 512/240, frames 0-2
    # here) and leaves every later frame bit-identical to production
    h1 = np.asarray(fused_logmel_iv(jnp.asarray(x), t_blk=32, interpret=True,
                                    split3=True, pre_scale=jnp.float32(1.0),
                                    pre_scale_head=True))
    np.testing.assert_array_equal(h1, base)
    h2 = np.asarray(fused_logmel_iv(jnp.asarray(x), t_blk=32, interpret=True,
                                    split3=True, pre_scale=jnp.float32(2.0),
                                    pre_scale_head=True))
    n_head_frames = -(-(1024 // 2) // 240)  # ceil(half / hop) = 3
    assert np.abs(h2[:, :, :n_head_frames] - base[:, :, :n_head_frames]).max() > 1e-4
    np.testing.assert_array_equal(h2[:, :, n_head_frames:],
                                  base[:, :, n_head_frames:])

    # post_affine + full_frames: affine applied per (channel, mel), frames
    # beyond n_frames (=101 here) zeroed, t_pad (=128) frames returned
    inv = rng.standard_normal((7, 64)).astype(np.float32)
    shift = rng.standard_normal((7, 64)).astype(np.float32)
    got = np.asarray(fused_logmel_iv(
        jnp.asarray(x), t_blk=32, interpret=True, split3=True,
        post_affine=(jnp.asarray(inv), jnp.asarray(shift)),
        full_frames=True))
    assert got.shape == (2, 7, 128, 64)
    ref = base * inv[None, :, None, :] + shift[None, :, None, :]
    np.testing.assert_allclose(got[:, :, :101], ref, rtol=1e-5, atol=1e-5)
    assert np.abs(got[:, :, 101:]).max() == 0.0

    # bf16 out_dtype: cast of the f32 result
    g16 = np.asarray(fused_logmel_iv(jnp.asarray(x), t_blk=32,
                                     interpret=True, split3=True,
                                     out_dtype=jnp.bfloat16),
                     np.float32)
    np.testing.assert_allclose(
        g16, base.astype(jnp.bfloat16).astype(np.float32), atol=1e-6)


def test_fused_frontend_bf16x2_split(rng):
    """split_mode='bf16x2' ([a_hi|a_hi] @ [hi;lo]: bf16 signal,
    f32-effective weights) stays within its documented band — dB error is
    the signal's bf16 rounding (~1e-1 worst-bin on white noise, the same
    order as the bf16 FEATURE cast the serving path applies via out_dtype),
    vs split3's ~2e-4."""
    x = rng.standard_normal((1, 4, 24000)).astype(np.float32) * 0.2
    ref = np.asarray(fused_logmel_iv(jnp.asarray(x), t_blk=32,
                                     interpret=True, radix2=True))
    got = np.asarray(fused_logmel_iv(jnp.asarray(x), t_blk=32,
                                     interpret=True, radix2=True,
                                     split_mode="bf16x2"))
    db = np.abs(got[:, :4] - ref[:, :4]).max()
    iv = np.abs(got[:, 4:] - ref[:, 4:]).max()
    # worst-bin dB error concentrates in low-energy mel bins (relative
    # linear-power noise is unbounded in dB at deep valleys) — 0.1-0.25
    # observed on white noise; that open-endedness is why bf16x2 is opt-in
    assert db < 0.4, f"bf16x2 dB error {db} out of band"
    assert iv < 2e-2, f"bf16x2 IV error {iv} out of band"
    # non-DIT paths must refuse rather than silently fall back
    import pytest

    with pytest.raises(NotImplementedError):
        fused_logmel_iv(jnp.asarray(x), t_blk=32, interpret=True,
                        radix2=False, split_mode="bf16x2")
