"""Import the reference's pure-torch model code as a *numerical oracle* for
checkpoint-converter parity tests.

The reference repo at /root/reference is read-only upstream content; we import
(never copy) its torch modules and compare our flax reimplementations against
their outputs with randomly initialized weights pushed through the converter.
Its package __init__ pulls in hydra/lightning/rich, which aren't installed —
stub just enough of them for the import to succeed.
"""

import logging
import sys
import types

_REF = "/root/reference/src"


def _stub(name, **attrs):
    """Create a fake module ONLY if the real one is not importable."""
    import importlib

    try:
        return importlib.import_module(name)
    except ImportError:
        pass
    mod = sys.modules.get(name) or types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def load_reference():
    """Make `models.components.*` of the reference importable; returns its path."""
    if _REF not in sys.path:
        sys.path.insert(0, _REF)

    class _Anything:
        def __getattr__(self, item):
            return _Anything()

        def __call__(self, *a, **k):
            return _Anything()

    _stub("hydra", main=lambda **k: (lambda f: f), utils=_Anything())
    _stub("rich", tree=_Anything(), syntax=_Anything(), print=print)
    _stub("rich.tree", Tree=_Anything())
    _stub("rich.syntax", Syntax=_Anything())
    lightning = _stub("lightning", Callback=object, LightningModule=object,
                      LightningDataModule=object, seed_everything=lambda *a, **k: None)
    pl = _stub("lightning.pytorch", callbacks=_Anything(), loggers=_Anything())
    _stub("lightning.pytorch.loggers", Logger=object)
    _stub("lightning.pytorch.utilities", rank_zero_only=lambda f: f)
    lightning.pytorch = pl

    class _DictConfig(dict):
        pass

    _stub("omegaconf", DictConfig=_DictConfig, OmegaConf=_Anything())
    _stub("torchmetrics", MeanMetric=object)

    class _Tqdm:
        def __init__(self, it=None, **k):
            self.it = it

        def __iter__(self):
            return iter(self.it)

        @staticmethod
        def write(*a, **k):
            pass

        def close(self):
            pass

    _stub("tqdm", tqdm=_Tqdm)

    # soundfile shim backed by this framework's native decoder, so the
    # reference's data/preproc code can run as an oracle
    import types as _types

    import numpy as _np

    from pseldnets_tpu.utils import audio_io as _aio

    def _sf_read(path, dtype="float32", start=0, stop=None, **k):
        x = _aio.load_audio(path, start or 0, stop)
        return _np.ascontiguousarray(x.T).astype(dtype), _aio.audio_info(path)[2]

    def _sf_info(path):
        frames, ch, sr = _aio.audio_info(path)
        return _types.SimpleNamespace(frames=frames, channels=ch, samplerate=sr)

    _stub("soundfile", read=_sf_read, info=_sf_info)

    # librosa shim: only the pieces the reference's feature/preproc code touches
    from pseldnets_tpu.ops.mel import mel_filterbank as _melfb

    def _librosa_mel(sr, n_fft, n_mels=128, fmin=0.0, fmax=None, htk=False,
                     norm="slaney", **k):
        return _melfb(sr, n_fft, n_mels, fmin=fmin, fmax=fmax,
                      scale="htk" if htk else "slaney", norm=norm).T

    lr = _stub("librosa")
    lr.filters = _types.SimpleNamespace(mel=_librosa_mel)
    lr.core = _Anything()
    sys.modules["librosa.filters"] = lr.filters

    # torchaudio shim: the transforms the reference extractors instantiate.
    # They are never *called* in the preproc-parity path (label extraction
    # only), so constructors suffice; anything invoked raises loudly.
    ta = _stub("torchaudio")
    if not hasattr(ta, "transforms"):
        class _NotCallable:
            def __init__(self, *a, **k):
                pass

            def __call__(self, *a, **k):
                raise RuntimeError("torchaudio shim: transform invoked in oracle")

        ta.transforms = _types.SimpleNamespace(
            Spectrogram=_NotCallable, MelScale=_NotCallable,
            AmplitudeToDB=_NotCallable)
        ta.functional = _Anything()
        sys.modules["torchaudio.transforms"] = ta.transforms
        sys.modules["torchaudio.functional"] = ta.functional
    return _REF
