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
    _stub("tqdm", tqdm=lambda x, **k: x)
    return _REF
