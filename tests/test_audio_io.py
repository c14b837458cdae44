"""Native audio decoder tests: WAV roundtrips and FLAC golden vectors covering
every subframe type, stereo decorrelation mode, rice/escape residuals, wasted
bits, and ranged reads."""

import sys, os

sys.path.insert(0, os.path.dirname(__file__))

import numpy as np
import pytest

from pseldnets_tpu.utils import audio_io
from flac_writer import write_flac


@pytest.fixture(scope="module")
def native_ok():
    lib = audio_io._get_lib()
    if not lib:
        pytest.skip("native decoder unavailable")
    return True


def test_wav_float_roundtrip(tmp_path, rng):
    x = rng.standard_normal((4, 4800)).astype(np.float32) * 0.3
    p = tmp_path / "a.wav"
    audio_io.write_wav(p, x, 24000)
    frames, ch, sr = audio_io.audio_info(p)
    assert (frames, ch, sr) == (4800, 4, 24000)
    y = audio_io.load_audio(p)
    np.testing.assert_array_equal(x, y)
    z = audio_io.load_audio(p, 100, 1100)
    np.testing.assert_array_equal(x[:, 100:1100], z)


def test_wav_pcm16(tmp_path, rng, native_ok):
    import wave

    x = (rng.standard_normal((2, 2000)) * 8000).astype(np.int16)
    p = tmp_path / "b.wav"
    with wave.open(str(p), "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(np.ascontiguousarray(x.T).tobytes())
    y = audio_io.load_audio(p)
    np.testing.assert_allclose(y, x.astype(np.float32) / 32768.0, atol=1e-7)


def _signal(rng, C=4, N=2000):
    t = np.arange(N)
    sig = np.stack([np.sin(2 * np.pi * (100 + 57 * c) * t / 24000) * 9000
                    + rng.standard_normal(N) * 300 for c in range(C)])
    return np.clip(sig, -32768, 32767).astype(np.int16)


def test_flac_verbatim(tmp_path, rng, native_ok):
    x = _signal(rng)
    p = tmp_path / "v.flac"
    write_flac(p, x, 24000)
    frames, ch, sr = audio_io.audio_info(p)
    assert (frames, ch, sr) == (2000, 4, 24000)
    y = audio_io.load_audio(p)
    np.testing.assert_allclose(y, x.astype(np.float32) / 32768.0, atol=1e-7)


def test_flac_subframe_types(tmp_path, rng, native_ok):
    x = _signal(rng)
    x[1, :] = 777  # constant channel
    plan_map = {
        (0, 0): {"kind": "fixed", "order": 2},
        (0, 1): {"kind": "constant"},
        (0, 2): {"kind": "lpc", "lpc_coef": [60, -30, 10], "lpc_shift": 5},
        (0, 3): {"kind": "verbatim", "wasted": 0},
        (1, 0): {"kind": "fixed", "order": 0},
        (1, 1): {"kind": "constant"},
        (1, 2): {"kind": "fixed", "order": 4, "escape": True},
        (1, 3): {"kind": "lpc", "lpc_coef": [100], "lpc_shift": 6},
    }

    def plan(fi, c):
        return plan_map.get((fi, c), {"kind": "fixed", "order": 1})

    p = tmp_path / "s.flac"
    write_flac(p, x, 24000, blocksize=512, subframe_plan=plan)
    y = audio_io.load_audio(p)
    np.testing.assert_allclose(y, x.astype(np.float32) / 32768.0, atol=1e-7)


def test_flac_wasted_bits(tmp_path, rng, native_ok):
    x = (_signal(rng, C=1) // 4 * 4).astype(np.int16)  # 2 wasted bits

    def plan(fi, c):
        return {"kind": "verbatim", "wasted": 2}

    p = tmp_path / "w.flac"
    write_flac(p, x, 24000, subframe_plan=plan)
    y = audio_io.load_audio(p)
    np.testing.assert_allclose(y, x.astype(np.float32) / 32768.0, atol=1e-7)


@pytest.mark.parametrize("mode", ["left-side", "right-side", "mid-side"])
def test_flac_stereo_decorrelation(tmp_path, rng, native_ok, mode):
    x = _signal(rng, C=2)
    p = tmp_path / f"{mode}.flac"
    write_flac(p, x, 24000, stereo_mode=mode)
    y = audio_io.load_audio(p)
    np.testing.assert_allclose(y, x.astype(np.float32) / 32768.0, atol=1e-7)


def test_flac_ranged_read(tmp_path, rng, native_ok):
    x = _signal(rng)
    p = tmp_path / "r.flac"
    write_flac(p, x, 24000, blocksize=300)
    y = audio_io.load_audio(p, 450, 1730)
    np.testing.assert_allclose(y, x[:, 450:1730].astype(np.float32) / 32768.0,
                               atol=1e-7)


def test_flac_seek_parity(tmp_path, rng, native_ok):
    """Binary-search seek (audio_decoder.cpp read_flac): ranged reads from
    many offsets — including ones landing mid-frame, on frame boundaries,
    and in the short LAST frame of a fixed-blocksize stream (whose header
    codes a frame index, converted via the STREAMINFO nominal blocksize) —
    are bit-identical to slicing the full decode."""
    C, N = 4, 120000  # ~293 frames of 409+1 samples + a short last frame
    x = (rng.standard_normal((C, N)) * 6000).astype(np.int16)
    p = tmp_path / "seek.flac"
    write_flac(p, x, 24000, blocksize=410)
    full = audio_io.load_audio(p)
    np.testing.assert_array_equal(full, x.astype(np.float32) / 32768.0)
    for start, stop in [(0, 500), (409, 1230), (410, 820), (59999, 60010),
                        (100000, 120000), (119795, 120000), (N - 1, N),
                        (73421, 74242)]:
        y = audio_io.load_audio(p, start, stop)
        np.testing.assert_array_equal(y, full[:, start:stop],
                                      err_msg=f"range {start}:{stop}")


def test_flac_seek_nonconformant_numbering(tmp_path, rng, native_ok):
    """A stream whose frame headers all code frame number 0 decodes correctly
    sequentially; the seek's consistency gate must detect the broken
    numbering and fall back to the full decode rather than mis-seek."""
    C, N = 2, 40000
    x = (rng.standard_normal((C, N)) * 6000).astype(np.int16)
    p = tmp_path / "zero.flac"
    write_flac(p, x, 24000, blocksize=256, frame_no_fn=lambda i: 0)
    full = audio_io.load_audio(p)
    np.testing.assert_array_equal(full, x.astype(np.float32) / 32768.0)
    y = audio_io.load_audio(p, 30000, 31000)
    np.testing.assert_array_equal(y, full[:, 30000:31000])
