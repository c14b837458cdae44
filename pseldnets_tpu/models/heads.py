"""Single-branch SELD heads: ACCDOA and multi-ACCDOA over CRNN / ConvConformer /
HTSAT / PaSST backbones.

Parity: reference src/models/accdoa.py (CRNN :12-95, HTSAT :107-246,
PASST :249-329) and src/models/multi_accdoa.py (same classes with
3-track-wide outputs). Output dict keys match the reference exactly:
{'accdoa': (B, T, 3K)} or {'multi_accdoa': (B, T, 9K)} with channel layout
[track0 x(K) y(K) z(K) | track1 ... | track2 ...].
"""

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .adapters import AdaptConfig, NO_ADAPT
from .backbone import CNN
from .common import Decoder, ScalarBN, interpolate
from .conformer import ConformerBlocks
from .htsat import HTSATEncoder
from .passt import PaSSTEncoder

Dtype = Any


class CRNN(nn.Module):
    """CNN8/CNN12 (+GRU/conformer/transformer decoder) ACCDOA head
    (reference accdoa.py:12-95)."""

    num_classes: int
    in_channels: int = 7
    encoder: str = "CNN8"
    num_features: Sequence[int] = (32, 64, 128, 256)
    decoder: Optional[str] = "gru"
    num_decoder_layers: int = 2
    mel_bins: int = 64
    pred_res: int = 10
    num_tracks: int = 1  # 1 => accdoa, 3 => multi_accdoa
    dtype: Dtype = jnp.float32

    @property
    def output_key(self):
        return "accdoa" if self.num_tracks == 1 else "multi_accdoa"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        # the conv depth is inferred from num_features; validate it against
        # the declared encoder so `encoder: CNN12` with a 4-entry
        # num_features fails loudly like the reference's explicit class
        # selection (accdoa.py:26-31) instead of silently building a CNN8
        expected = {"CNN8": 4, "CNN12": 6}.get(self.encoder)
        assert expected is None or len(self.num_features) == expected, (
            f"encoder={self.encoder} expects {expected} num_features, "
            f"got {len(self.num_features)}: {tuple(self.num_features)}")
        N, _, T, _ = x.shape
        output_frames = T // self.pred_res

        x = ScalarBN(self.in_channels, self.mel_bins, dtype=self.dtype,
                     name="scalar")(x, use_running_average=not train)
        x = CNN(num_features=tuple(self.num_features), dtype=self.dtype,
                name="convs")(x, train)
        x = x.mean(axis=3)  # (N, C, T')
        x = jnp.transpose(x, (0, 2, 1))  # (N, T', C)
        if self.decoder == "conformer":
            x = ConformerBlocks(encoder_dim=self.num_features[-1],
                                num_layers=self.num_decoder_layers,
                                dtype=self.dtype, name="decoder")(x, train, not train)
        else:
            x = Decoder(self.decoder, self.num_features[-1],
                        num_layers=self.num_decoder_layers, dtype=self.dtype,
                        name="decoder")(x, deterministic=not train)
        x = interpolate(x, ratio=8)  # 2^3 time pools
        x = x.reshape(N, output_frames, self.pred_res, -1).mean(axis=2)
        x = nn.Dense(3 * self.num_tracks * self.num_classes, dtype=self.dtype,
                     name="fc")(x)
        return {self.output_key: jnp.tanh(x)}


class HTSAT(nn.Module):
    """HTS-AT backbone + tscam conv head (reference accdoa.py:107-246).

    Handles the 5s-clip trick: when the incoming clip yields tgt_output_frames/2
    label frames, the two batch halves are concatenated time-wise into 10s clips
    for the encoder and split back afterwards (accdoa.py:211-240).
    """

    num_classes: int
    in_channels: int = 7
    mel_bins: int = 64
    pred_res: int = 10
    num_tracks: int = 1
    tgt_output_frames: int = 100
    adapt: AdaptConfig = NO_ADAPT
    encoder_kwargs: Tuple[Tuple[str, Any], ...] = ()
    dtype: Dtype = jnp.float32

    @property
    def output_key(self):
        return "accdoa" if self.num_tracks == 1 else "multi_accdoa"

    def setup(self):
        kw = dict(self.encoder_kwargs)
        self.encoder = HTSATEncoder(in_chans=self.in_channels, mel_bins=self.mel_bins,
                                    adapt=self.adapt, dtype=self.dtype, **kw)
        self.scalar = ScalarBN(self.in_channels, self.mel_bins, dtype=self.dtype)
        self.tscam_conv = nn.Conv(
            features=self.num_classes * 3 * self.num_tracks,
            kernel_size=(self.encoder.SF, 3), strides=(1, 1),
            padding=((0, 0), (1, 1)), dtype=self.dtype)

    def __call__(self, x: jnp.ndarray, train: bool = False):
        B, C, T, F = x.shape
        output_frames = T // self.pred_res
        if output_frames < self.tgt_output_frames:
            assert output_frames == self.tgt_output_frames // 2, \
                "only 5-second or 10-second clips are supported"
            assert B % 2 == 0
            x = jnp.concatenate([x[: B // 2, :, :-1], x[B // 2:, :, :-1]], axis=2)
        elif output_frames > self.tgt_output_frames:
            raise NotImplementedError("output_frames > tgt_output_frames")

        x = self.scalar(x, use_running_average=not train)
        x = self.encoder(x, deterministic=not train)  # (B', 768, SF, ST)
        x = jnp.transpose(x, (0, 2, 3, 1))  # NHWC for conv
        x = self.tscam_conv(x)  # (B', 1, ST, out)
        x = x.reshape(x.shape[0], -1, x.shape[-1])  # (B', ST, out)

        x = interpolate(x, ratio=self.encoder.time_res, method="bilinear")
        x = x[:, : self.tgt_output_frames * self.pred_res]
        if output_frames < self.tgt_output_frames:
            half = output_frames * self.pred_res
            x = jnp.concatenate([x[:, :half], x[:, half:]], axis=0)
        x = x.reshape(B, output_frames, self.pred_res, -1).mean(axis=2)
        return {self.output_key: jnp.tanh(x)}


class PASST(nn.Module):
    """PaSST backbone + linear head (reference accdoa.py:249-329)."""

    num_classes: int
    in_channels: int = 7
    mel_bins: int = 64
    num_tracks: int = 1
    encoder_kwargs: Tuple[Tuple[str, Any], ...] = ()
    dtype: Dtype = jnp.float32

    @property
    def output_key(self):
        return "accdoa" if self.num_tracks == 1 else "multi_accdoa"

    def setup(self):
        self.scalar = ScalarBN(self.in_channels, self.mel_bins, dtype=self.dtype)
        self.encoder = PaSSTEncoder(in_chans=self.in_channels, dtype=self.dtype,
                                    **dict(self.encoder_kwargs))
        self.fc = nn.Dense(3 * self.num_tracks * self.num_classes, dtype=self.dtype)

    def __call__(self, x: jnp.ndarray, train: bool = False):
        x = self.scalar(x, use_running_average=not train)
        fm, _ = self.encoder(x, train=train, deterministic=not train)
        return {self.output_key: jnp.tanh(self.fc(fm))}


class ConvConformer(CRNN):
    """CRNN with a Conformer decoder (reference accdoa.py:98-104)."""

    decoder: Optional[str] = "conformer"
