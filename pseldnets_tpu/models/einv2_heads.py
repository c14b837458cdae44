"""EINV2 dual-branch heads (SED branch + DOA branch, soft parameter sharing via
CrossStitch) and the single-encoder SEDDOA variant.

Parity: reference src/models/einv2.py — CRNN (:17-171), HTSAT (:189-327),
HTSAT_SEDDOA (:329-442), PASST (:446-576). Output dict:
{'sed': (B, T, 3, K) logits, 'doa': (B, T, 3, 3) tanh}.
"""

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .adapters import AdaptConfig, NO_ADAPT
from .backbone import CNN
from .common import CrossStitch, Decoder, ScalarBN, interpolate
from .htsat import HTSATEncoder
from .passt import PaSSTEncoder

Dtype = Any

SED_IN_CHANNELS = 4


class CRNN(nn.Module):
    """(reference einv2.py:17-171)."""

    num_classes: int
    in_channels: int = 7
    encoder: str = "CNN8"
    num_features: Sequence[int] = (32, 64, 128, 256)
    decoder: Optional[str] = "gru"
    num_decoder_layers: int = 2
    mel_bins: int = 64
    pred_res: int = 10
    dtype: Dtype = jnp.float32

    def setup(self):
        nf = tuple(self.num_features)
        self.scalar = ScalarBN(self.in_channels, self.mel_bins, dtype=self.dtype)
        self.sed_convs = CNN(num_features=nf, dtype=self.dtype)
        self.doa_convs = CNN(num_features=nf, dtype=self.dtype)
        # one stitch per conv block (applied after all but the last block in the
        # reference loop) plus 3 track-level stitches; reference builds
        # len(nf)+2 stitches and indexes [-3:] for tracks (einv2.py:36-38,137-139)
        self.stitch = [CrossStitch(feat_dim=f, dtype=self.dtype, name=f"stitch_{i}")
                       for i, f in enumerate(list(nf) + [nf[-1], nf[-1]])]
        dec = lambda name: Decoder(self.decoder, nf[-1],
                                   num_layers=self.num_decoder_layers,
                                   dtype=self.dtype, name=name)
        self.sed_track1, self.sed_track2, self.sed_track3 = \
            dec("sed_track1"), dec("sed_track2"), dec("sed_track3")
        self.doa_track1, self.doa_track2, self.doa_track3 = \
            dec("doa_track1"), dec("doa_track2"), dec("doa_track3")
        self.fc_sed = [nn.Dense(self.num_classes, dtype=self.dtype, name=f"fc_sed_track{i+1}")
                       for i in range(3)]
        self.fc_doa = [nn.Dense(3, dtype=self.dtype, name=f"fc_doa_track{i+1}")
                       for i in range(3)]

    def __call__(self, x: jnp.ndarray, train: bool = False):
        N, _, T, _ = x.shape
        output_frames = T // self.pred_res
        x = self.scalar(x, use_running_average=not train)
        x_sed = x[:, :SED_IN_CHANNELS]
        x_doa = x

        n_blocks = len(self.num_features)
        for i in range(n_blocks - 1):
            x_sed = self.sed_convs.run_block(i, x_sed, train)
            x_doa = self.doa_convs.run_block(i, x_doa, train)
            x_sed, x_doa = self.stitch[i](x_sed, x_doa)
        x_sed = self.sed_convs.run_block(n_blocks - 1, x_sed, train)
        x_doa = self.doa_convs.run_block(n_blocks - 1, x_doa, train)
        x_sed = jnp.transpose(x_sed.mean(axis=3), (0, 2, 1))  # (N, T', C)
        x_doa = jnp.transpose(x_doa.mean(axis=3), (0, 2, 1))

        sed_tracks = [self.sed_track1(x_sed), self.sed_track2(x_sed), self.sed_track3(x_sed)]
        doa_tracks = [self.doa_track1(x_doa), self.doa_track2(x_doa), self.doa_track3(x_doa)]
        for i in range(3):
            sed_tracks[i], doa_tracks[i] = self.stitch[-3 + i](sed_tracks[i], doa_tracks[i])

        preds_sed, preds_doa = [], []
        for i in range(3):
            s = interpolate(sed_tracks[i], ratio=8)
            d = interpolate(doa_tracks[i], ratio=8)
            s = s.reshape(N, output_frames, self.pred_res, -1).mean(axis=2)
            d = d.reshape(N, output_frames, self.pred_res, -1).mean(axis=2)
            preds_sed.append(self.fc_sed[i](s))
            preds_doa.append(jnp.tanh(self.fc_doa[i](d)))
        return {"sed": jnp.stack(preds_sed, axis=2), "doa": jnp.stack(preds_doa, axis=2)}


class HTSAT(nn.Module):
    """Dual HTS-AT encoders stitched per stage (reference einv2.py:189-327)."""

    num_classes: int
    in_channels: int = 7
    mel_bins: int = 64
    pred_res: int = 10
    tgt_output_frames: int = 100
    adapt: AdaptConfig = NO_ADAPT
    encoder_kwargs: Tuple[Tuple[str, Any], ...] = ()
    dtype: Dtype = jnp.float32

    def setup(self):
        kw = dict(self.encoder_kwargs)
        self.scalar = ScalarBN(self.in_channels, self.mel_bins, dtype=self.dtype)
        self.sed_encoder = HTSATEncoder(in_chans=SED_IN_CHANNELS, mel_bins=self.mel_bins,
                                        adapt=self.adapt, dtype=self.dtype, **kw)
        self.doa_encoder = HTSATEncoder(in_chans=self.in_channels, mel_bins=self.mel_bins,
                                        adapt=self.adapt, dtype=self.dtype, **kw)
        embed_dim = kw.get("embed_dim", 96)
        depths = kw.get("depths", (2, 2, 6, 2))
        feats = [embed_dim * (2 ** i) for i in range(len(depths))]
        self.stitch1 = [CrossStitch(feat_dim=f, dtype=self.dtype, name=f"stitch1_{i}")
                        for i, f in enumerate(feats)]
        self.sed_tscam_conv = nn.Conv(self.num_classes * 3,
                                      kernel_size=(self.sed_encoder.SF, 3),
                                      padding=((0, 0), (1, 1)), dtype=self.dtype)
        self.doa_tscam_conv = nn.Conv(3 * 3,
                                      kernel_size=(self.doa_encoder.SF, 3),
                                      padding=((0, 0), (1, 1)), dtype=self.dtype)

    def __call__(self, x: jnp.ndarray, train: bool = False):
        B, C, T, F = x.shape
        output_frames = T // self.pred_res
        if output_frames < self.tgt_output_frames:
            assert output_frames == self.tgt_output_frames // 2
            assert B % 2 == 0
            x = jnp.concatenate([x[: B // 2, :, :-1], x[B // 2:, :, :-1]], axis=2)
        elif output_frames > self.tgt_output_frames:
            raise NotImplementedError

        x = self.scalar(x, use_running_average=not train)
        det = not train
        x_sed = self.sed_encoder.embed(x[:, :SED_IN_CHANNELS], det)
        x_doa = self.doa_encoder.embed(x, det)
        for i in range(len(self.stitch1)):
            x_sed, x_doa = self.stitch1[i](x_sed, x_doa)
            x_sed = self.sed_encoder.run_stage(i, x_sed, det)
            x_doa = self.doa_encoder.run_stage(i, x_doa, det)
        x_sed = self.sed_encoder.finalize(x_sed)
        x_doa = self.doa_encoder.finalize(x_doa)

        def head(tok, conv, time_res):
            h = jnp.transpose(tok, (0, 2, 3, 1))
            h = conv(h).reshape(tok.shape[0], -1, conv.features)
            h = interpolate(h, ratio=time_res, method="bilinear")
            h = h[:, : self.tgt_output_frames * self.pred_res]
            if output_frames < self.tgt_output_frames:
                half = output_frames * self.pred_res
                h = jnp.concatenate([h[:, :half], h[:, half:]], axis=0)
            return h.reshape(B, output_frames, self.pred_res, 3, -1).mean(axis=2)

        pred_sed = head(x_sed, self.sed_tscam_conv, self.sed_encoder.time_res)
        pred_doa = jnp.tanh(head(x_doa, self.doa_tscam_conv, self.doa_encoder.time_res))
        return {"sed": pred_sed, "doa": pred_doa}


class HTSAT_SEDDOA(nn.Module):
    """Single shared encoder, two tscam heads (reference einv2.py:329-442)."""

    num_classes: int
    in_channels: int = 7
    mel_bins: int = 64
    pred_res: int = 10
    tgt_output_frames: int = 100
    adapt: AdaptConfig = NO_ADAPT
    encoder_kwargs: Tuple[Tuple[str, Any], ...] = ()
    dtype: Dtype = jnp.float32

    def setup(self):
        kw = dict(self.encoder_kwargs)
        self.scalar = ScalarBN(self.in_channels, self.mel_bins, dtype=self.dtype)
        self.encoder = HTSATEncoder(in_chans=self.in_channels, mel_bins=self.mel_bins,
                                    adapt=self.adapt, dtype=self.dtype, **kw)
        self.sed_tscam_conv = nn.Conv(self.num_classes * 3,
                                      kernel_size=(self.encoder.SF, 3),
                                      padding=((0, 0), (1, 1)), dtype=self.dtype)
        self.doa_tscam_conv = nn.Conv(3 * 3,
                                      kernel_size=(self.encoder.SF, 3),
                                      padding=((0, 0), (1, 1)), dtype=self.dtype)

    def __call__(self, x: jnp.ndarray, train: bool = False):
        B, C, T, F = x.shape
        output_frames = T // self.pred_res
        if output_frames < self.tgt_output_frames:
            assert output_frames == self.tgt_output_frames // 2
            assert B % 2 == 0
            x = jnp.concatenate([x[: B // 2, :, :-1], x[B // 2:, :, :-1]], axis=2)
        elif output_frames > self.tgt_output_frames:
            raise NotImplementedError

        x = self.scalar(x, use_running_average=not train)
        tok = self.encoder(x, deterministic=not train)

        def head(conv):
            h = jnp.transpose(tok, (0, 2, 3, 1))
            h = conv(h).reshape(tok.shape[0], -1, conv.features)
            h = interpolate(h, ratio=self.encoder.time_res, method="bilinear")
            h = h[:, : self.tgt_output_frames * self.pred_res]
            if output_frames < self.tgt_output_frames:
                half = output_frames * self.pred_res
                h = jnp.concatenate([h[:, :half], h[:, half:]], axis=0)
            return h.reshape(B, output_frames, self.pred_res, 3, -1).mean(axis=2)

        return {"sed": head(self.sed_tscam_conv),
                "doa": jnp.tanh(head(self.doa_tscam_conv))}


class PASST(nn.Module):
    """Dual PaSST stitched every ps_gap blocks + 3 track decoders
    (reference einv2.py:446-576)."""

    num_classes: int
    in_channels: int = 7
    mel_bins: int = 64
    ps_gap: int = 2
    decoder: Optional[str] = None
    num_decoder_layers: int = 2
    encoder_kwargs: Tuple[Tuple[str, Any], ...] = ()
    dtype: Dtype = jnp.float32

    def setup(self):
        kw = dict(self.encoder_kwargs)
        self.scalar = ScalarBN(self.in_channels, self.mel_bins, dtype=self.dtype)
        self.sed_encoder = PaSSTEncoder(in_chans=SED_IN_CHANNELS, dtype=self.dtype, **kw)
        self.doa_encoder = PaSSTEncoder(in_chans=self.in_channels, dtype=self.dtype, **kw)
        embed_dim = kw.get("embed_dim", 768)
        depth = kw.get("depth", 7)
        num_stitch = (depth - 1) // self.ps_gap + 1
        self.stitch1 = [CrossStitch(feat_dim=embed_dim, dtype=self.dtype,
                                    name=f"stitch1_{i}") for i in range(num_stitch)]
        self.stitch2 = [CrossStitch(feat_dim=embed_dim, dtype=self.dtype,
                                    name=f"stitch2_{i}") for i in range(3)]
        self.sed_decoder = [Decoder(self.decoder, embed_dim, self.num_decoder_layers,
                                    dtype=self.dtype, name=f"sed_decoder_{i}")
                            for i in range(3)]
        self.doa_decoder = [Decoder(self.decoder, embed_dim, self.num_decoder_layers,
                                    dtype=self.dtype, name=f"doa_decoder_{i}")
                            for i in range(3)]
        self.fc_sed = [nn.Dense(self.num_classes, dtype=self.dtype, name=f"fc_sed_{i}")
                       for i in range(3)]
        self.fc_doa = [nn.Dense(3, dtype=self.dtype, name=f"fc_doa_{i}")
                       for i in range(3)]

    def __call__(self, x: jnp.ndarray, train: bool = False):
        det = not train
        x = self.scalar(x, use_running_average=det)
        x_sed = self.sed_encoder.forward_before(x[:, :SED_IN_CHANNELS], train)
        x_doa = self.doa_encoder.forward_before(x, train)
        depth = self.sed_encoder.depth
        for i in range(depth):
            if i % self.ps_gap == 0:
                x_sed, x_doa = self.stitch1[i // self.ps_gap](x_sed, x_doa)
            x_sed = self.sed_encoder.run_block(i, x_sed, det)
            x_doa = self.doa_encoder.run_block(i, x_doa, det)
        x_sed, _ = self.sed_encoder.forward_after(x_sed, train)
        x_doa, _ = self.doa_encoder.forward_after(x_doa, train)

        preds_sed, preds_doa = [], []
        for i in range(3):
            s = self.sed_decoder[i](x_sed, deterministic=det)
            d = self.doa_decoder[i](x_doa, deterministic=det)
            s, d = self.stitch2[i](s, d)
            preds_sed.append(self.fc_sed[i](s))
            preds_doa.append(jnp.tanh(self.fc_doa[i](d)))
        return {"sed": jnp.stack(preds_sed, axis=2),
                "doa": jnp.stack(preds_doa, axis=2)}
