"""Offline-preprocessing parity: run OUR Preprocess and the REFERENCE
Preprocess (torch oracle with the soundfile shim) over the same synthetic
corpus and diff the index CSVs and ACCDOA/track/ADPIT label HDF5s."""

import sys, os

sys.path.insert(0, os.path.dirname(__file__))

import h5py
import numpy as np
import pytest

from reference_oracle import load_reference
from pseldnets_tpu.config import Config
from pseldnets_tpu.data.datasets import Synthesis
from pseldnets_tpu.preproc import Preprocess

load_reference()

from test_e2e import _make_corpus, FS, K  # noqa: E402


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    rng = np.random.default_rng(13)
    root = tmp_path_factory.mktemp("pp_datasets")
    _make_corpus(root, rng, "ppset_ov1", "fold0_room0", 2)
    with open(root / "cls_indices_train.tsv", "w") as f:
        for i in range(K):
            f.write(f"x\ty\tclass_{i}\n")
    return root


def _cfg(root, hdf5_dir):
    return Config.wrap({
        "data": {"sample_rate": FS, "nfft": 256, "n_mels": 16, "hoplen": 160,
                 "window": "hann", "audio_feature": "logmelIV",
                 "train_chunklen_sec": 4, "train_hoplen_sec": 4,
                 "test_chunklen_sec": 4, "test_hoplen_sec": 4,
                 "train_dataset": {"ppset_ov1": ["fold0_room0"]}},
        "paths": {"dataset_dir": str(root), "hdf5_dir": str(hdf5_dir)},
        "dataset": "ppset_ov1", "dataset_type": "dev", "wav_format": ".flac",
    })


def _run_reference(root, hdf5_dir):
    # our src/preproc.py shadows the reference's preproc package when
    # tests/test_e2e.py put src/ on sys.path — load by explicit file path
    import importlib.util

    spec_ = importlib.util.spec_from_file_location(
        "ref_preprocess", "/root/reference/src/preproc/preprocess.py")
    mod = importlib.util.module_from_spec(spec_)
    spec_.loader.exec_module(mod)
    RefPreprocess = mod.Preprocess

    cfg = _cfg(root, hdf5_dir)
    spec = Synthesis(str(root), cfg)
    rp = RefPreprocess(cfg, spec)
    rp.extract_index()
    rp.extract_accdoa_label()
    rp.extract_track_label()
    rp.extract_adpit_label()


def _run_ours(root, hdf5_dir):
    cfg = _cfg(root, hdf5_dir)
    spec = Synthesis(str(root), cfg)
    p = Preprocess(cfg, spec)
    p.extract_index()
    p.extract_accdoa_label()
    p.extract_track_label()
    p.extract_adpit_label()


def _h5_to_dict(path):
    out = {}

    def visit(name, obj):
        if isinstance(obj, h5py.Dataset):
            out[name] = obj[()]

    with h5py.File(path, "r") as hf:
        hf.visititems(visit)
    return out


def test_preproc_matches_reference(corpus, tmp_path_factory):
    ours = tmp_path_factory.mktemp("ours")
    ref = tmp_path_factory.mktemp("ref")
    _run_ours(corpus, ours)
    _run_reference(corpus, ref)

    # index CSVs identical
    for split in ("train", "test"):
        a = (ours / f"data/{FS}fs/wav/dev/ppset_ov1_4sChunklen_4sHoplen_{split}.csv").read_text()
        b = (ref / f"data/{FS}fs/wav/dev/ppset_ov1_4sChunklen_4sHoplen_{split}.csv").read_text()
        assert a == b, f"{split} index csv mismatch"

    # label HDF5s identical
    for kind in ("accdoa", "track", "adpit"):
        da = _h5_to_dict(ours / f"label/{kind}/dev/ppset_ov1.h5")
        db = _h5_to_dict(ref / f"label/{kind}/dev/ppset_ov1.h5")
        assert da.keys() == db.keys(), kind
        for k in da:
            np.testing.assert_array_equal(da[k], db[k], err_msg=f"{kind}/{k}")
