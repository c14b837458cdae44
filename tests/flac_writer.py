"""Minimal FLAC *encoder* used only to generate golden test vectors for the
native C++ decoder. Supports verbatim/constant/fixed/LPC subframes, rice
residuals (incl. escape partitions), independent and mid/left/right-side
stereo, wasted bits — enough to exercise every decoder path.
"""

import numpy as np


class BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int):
        if bits == 0:
            return
        value &= (1 << bits) - 1
        self.acc = (self.acc << bits) | value
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, value: int, bits: int):
        self.write(value & ((1 << bits) - 1), bits)

    def write_unary(self, q: int):
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self):
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self):
        assert self.nbits == 0
        return bytes(self.buf)


def _crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c ^= b
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
    return c


def _crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c ^= b << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
    return c


def _utf8_code(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    out = []
    bits = n.bit_length()
    nbytes = 2
    while bits > 5 * nbytes + (7 - nbytes):
        nbytes += 1
    prefix = (0xFF << (8 - nbytes)) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(prefix | (n >> shift))
    for i in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


def _write_residual(bw, resid, param, escape=False, method=0):
    plen = 4 if method == 0 else 5
    bw.write(method, 2)
    bw.write(0, 4)  # partition order 0
    if escape:
        bw.write(0xF if method == 0 else 0x1F, plen)
        raw = max(int(np.abs(resid).max()).bit_length() + 1, 2)
        bw.write(raw, 5)
        for v in resid:
            bw.write_signed(int(v), raw)
        return
    bw.write(param, plen)
    for v in resid:
        u = (int(v) << 1) ^ (int(v) >> 63) if int(v) >= 0 else ((-int(v)) << 1) - 1
        u = (int(v) << 1) if int(v) >= 0 else ((-int(v) << 1) - 1)
        bw.write_unary(u >> param)
        bw.write(u & ((1 << param) - 1), param)


_FIXED_COEF = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _write_subframe(bw, x, bps, kind="verbatim", order=2, lpc_coef=None,
                    lpc_shift=5, wasted=0, rice_param=None, escape=False):
    x = np.asarray(x, np.int64)
    if kind == "lpc":
        order = len(lpc_coef)
    bw.write(0, 1)  # padding
    if kind == "constant":
        bw.write(0, 6)
    elif kind == "verbatim":
        bw.write(1, 6)
    elif kind == "fixed":
        bw.write(8 + order, 6)
    elif kind == "lpc":
        bw.write(32 + order - 1, 6)
    else:
        raise ValueError(kind)
    if wasted:
        bw.write(1, 1)
        bw.write(1, wasted)  # (wasted-1) zeros then a 1
        x = x >> wasted
        bps = bps - wasted
    else:
        bw.write(0, 1)

    if kind == "constant":
        assert np.all(x == x[0])
        bw.write_signed(int(x[0]), bps)
        return
    if kind == "verbatim":
        for v in x:
            bw.write_signed(int(v), bps)
        return
    if kind == "fixed":
        coef = np.array(_FIXED_COEF[order], np.int64)
        for v in x[:order]:
            bw.write_signed(int(v), bps)
        pred = np.zeros(len(x) - order, np.int64)
        for j, c in enumerate(coef):
            pred += c * x[order - 1 - j: len(x) - 1 - j]
        resid = x[order:] - pred
    else:  # lpc
        coef = np.asarray(lpc_coef, np.int64)
        order = len(coef)
        for v in x[:order]:
            bw.write_signed(int(v), bps)
        precision = 12
        bw.write(precision - 1, 4)
        bw.write_signed(lpc_shift, 5)
        for c in coef:
            bw.write_signed(int(c), precision)
        pred = np.zeros(len(x) - order, np.int64)
        for j, c in enumerate(coef):
            pred += c * x[order - 1 - j: len(x) - 1 - j]
        resid = x[order:] - (pred >> lpc_shift)
    if rice_param is None:
        mean = max(float(np.abs(resid).mean()), 1.0)
        rice_param = max(int(np.ceil(np.log2(mean + 1))), 0)
        rice_param = min(rice_param + 1, 14)
    _write_residual(bw, resid, rice_param, escape=escape)


def write_flac(path, audio_i16: np.ndarray, samplerate: int, blocksize: int = 256,
               subframe_plan=None, stereo_mode="independent", frame_no_fn=None):
    """audio_i16: (channels, frames) int16. subframe_plan: callable
    (frame_idx, ch) -> kwargs for _write_subframe, or None for verbatim.
    frame_no_fn: callable frame_idx -> coded frame number, for testing the
    decoder's handling of non-conformant numbering (seek must fall back)."""
    audio = np.asarray(audio_i16, np.int64)
    C, N = audio.shape
    bps = 16

    out = bytearray(b"fLaC")
    # STREAMINFO (last metadata block)
    si = BitWriter()
    si.write(blocksize, 16)
    si.write(blocksize, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(samplerate, 20)
    si.write(C - 1, 3)
    si.write(bps - 1, 5)
    si.write(N, 36)
    body = si.bytes() if si.nbits == 0 else None
    si.align()
    body = si.bytes() + b"\x00" * 16  # md5 zeros
    out += bytes([0x80 | 0]) + len(body).to_bytes(3, "big") + body

    nframes = (N + blocksize - 1) // blocksize
    for fi in range(nframes):
        lo, hi = fi * blocksize, min((fi + 1) * blocksize, N)
        bs = hi - lo
        bw = BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)  # reserved
        bw.write(0, 1)  # fixed blocksize stream
        bw.write(7, 4)  # 16-bit blocksize follows
        bw.write(0, 4)  # samplerate from STREAMINFO
        if stereo_mode == "independent" or C != 2:
            ch_asgn = C - 1
        else:
            ch_asgn = {"left-side": 8, "right-side": 9, "mid-side": 10}[stereo_mode]
        bw.write(ch_asgn, 4)
        bw.write(0, 3)  # sample size from STREAMINFO
        bw.write(0, 1)
        for b in _utf8_code(fi if frame_no_fn is None else frame_no_fn(fi)):
            bw.write(b, 8)
        bw.write(bs - 1, 16)
        bw.write(_crc8(bytes(bw.buf)), 8)  # header CRC-8 (decoder verifies)

        block = audio[:, lo:hi]
        if C == 2 and stereo_mode != "independent":
            l, r = block[0], block[1]
            if stereo_mode == "left-side":
                subs = [(l, bps), (l - r, bps + 1)]
            elif stereo_mode == "right-side":
                subs = [(l - r, bps + 1), (r, bps)]
            else:  # mid-side
                subs = [((l + r) >> 1, bps), (l - r, bps + 1)]
        else:
            subs = [(block[c], bps) for c in range(C)]

        for c, (sig, sbps) in enumerate(subs):
            kwargs = dict(kind="verbatim")
            if subframe_plan is not None:
                kwargs = dict(subframe_plan(fi, c) or {"kind": "verbatim"})
            _write_subframe(bw, sig, sbps, **kwargs)
        bw.align()
        bw.write(_crc16(bytes(bw.buf)), 16)  # frame CRC-16
        out += bw.bytes()

    with open(path, "wb") as f:
        f.write(bytes(out))
