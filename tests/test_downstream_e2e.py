"""Downstream-corpus end-to-end tests: the two transfer datasets whose data
paths differ structurally from the synth corpus.

L3DAS22 (reference src/preproc/preprocess.py:566-611, configs/data/l3das22):
32 kHz, hop 320, fixed 30 s clips, `_B.wav` second-mic exclusion, start/end/XYZ
label csv -> framewise metadata conversion, split-named files.

STARSS23 (reference src/data/components/data.py:66-98): .wav corpus under
foa_dev/metadata_dev, variable-length clips, up to 6 simultaneous events
(6-track label tensor), fold_room file naming.

Each runs preproc -> 1-epoch train -> valid inference through the real CLIs.
"""

import sys, os, json, wave

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))

import numpy as np
import pytest


def write_wav(path, sig_int16, fs):
    """(C, N) int16 -> interleaved PCM wav."""
    with wave.open(str(path), "wb") as w:
        w.setnchannels(sig_int16.shape[0])
        w.setsampwidth(2)
        w.setframerate(fs)
        w.writeframes(np.ascontiguousarray(sig_int16.T).tobytes())


# --------------------------------------------------------------------- L3DAS22

L3_CLASSES = ["Chink_and_clink", "Computer_keyboard", "Cupboard_open_or_close",
              "Drawer_open_or_close", "Female_speech_and_woman_speaking"]


@pytest.fixture(scope="module")
def l3das22_corpus(tmp_path_factory):
    rng = np.random.default_rng(13)
    root = tmp_path_factory.mktemp("l3das22_root")
    FS, SEC = 32000, 30
    # split0-4 live under data_train (dev stage); split5 is the held-out test
    # set under data_test (eval stage) — reference data.py:47
    for split, n, stage in (("split0", 2, "train"), ("split5", 1, "test")):
        data = root / "L3DAS22" / f"data_{stage}"
        labels = root / "L3DAS22" / f"labels_{stage}"
        data.mkdir(parents=True, exist_ok=True)
        labels.mkdir(parents=True, exist_ok=True)
        for i in range(n):
            stem = f"{split}_ov1_{i}"
            sig = (rng.standard_normal((4, FS * SEC)) * 2500).astype(np.int16)
            write_wav(data / f"{stem}_A.wav", sig, FS)
            # second-mic file that preproc MUST exclude
            write_wav(data / f"{stem}_B.wav", sig, FS)
            with open(labels / f"label_{stem}.csv", "w") as f:
                f.write("File,Start,End,Class,X,Y,Z\n")
                for ev in range(12):
                    t0 = float(rng.uniform(0, SEC - 2))
                    cls = L3_CLASSES[int(rng.integers(0, len(L3_CLASSES)))]
                    x, y, z = rng.standard_normal(3)
                    f.write(f"x,{t0:.2f},{t0 + 1.5:.2f},{cls},"
                            f"{x:.3f},{y:.3f},{z:.3f}\n")
    return root


def _l3_overrides(root, work, extra=()):
    return [
        "data=l3das22/ov1",
        "data.nfft=256", "data.n_mels=16",
        # 2 s chunks: the tiny spec_size-64 HTSAT takes <=256 frames
        # (32 kHz / hop 320 -> 201); keeps the 32 kHz/hop-320 essentials
        "data.train_chunklen_sec=2", "data.train_hoplen_sec=2",
        "data.test_chunklen_sec=2", "data.test_hoplen_sec=2",
        "data.train_dataset={L3DAS22: [split0]}",
        "data.valid_dataset={L3DAS22: [split5]}",
        "data.test_dataset={L3DAS22: [split5]}",
        f"paths.dataset_dir={root}",
        f"paths.hdf5_dir={work}/_hdf5",
        f"paths.log_dir={work}/logs",
        "loss=multi_accdoa",
        "model=htsat",
        "model.kwargs.spec_size=64", "model.kwargs.embed_dim=8",
        "model.kwargs.depths=[1,1]", "model.kwargs.num_heads=[2,4]",
        "model.kwargs.window_size=4", "model.kwargs.drop_path_rate=0.0",
        "model.kwargs.pretrained_path=null",
        "model.kwargs.audioset_pretrain=false",
        "model.kwargs.tgt_output_frames=20",
        "model.batch_size=2",
        "num_workers=0",
    ] + list(extra)


def test_l3das22_e2e(l3das22_corpus, tmp_path_factory):
    work = tmp_path_factory.mktemp("l3_work")
    from cli_loader import load_cli

    preproc_cli = load_cli("preproc")
    for stage in ("dev", "eval"):  # split0-4 -> dev, split5 -> eval
        preproc_cli.main(_l3_overrides(l3das22_corpus, work,
                                       ["dataset=L3DAS22", "wav_format=.wav",
                                        f"dataset_type={stage}"]))

    hdf5 = work / "_hdf5"
    idx = hdf5 / "data/32000fs/wav/dev/L3DAS22_2sChunklen_2sHoplen_train.csv"
    assert idx.exists()
    rows = idx.read_text().strip().splitlines()
    assert rows and all("_B.wav" not in r for r in rows), "_B.wav not excluded"
    # converted metadata written next to the corpus (reference behavior)
    metas = sorted((l3das22_corpus / "L3DAS22" / "metadata_train").glob("*.csv"))
    assert len(metas) == 2  # one per dev _A clip
    assert (hdf5 / "label/adpit/dev/L3DAS22.h5").exists()
    assert (hdf5 / "label/adpit/eval/L3DAS22.h5").exists()

    # 1-epoch AdapterBit-style fine-tune (frozen backbone + adapters) + infer
    train_cli = load_cli("train")
    infer_cli = load_cli("infer")
    train_cli.main(_l3_overrides(l3das22_corpus, work, [
        "adapt=adapter", "trainer.max_epochs=1",
        "trainer.precision=32-true", "seed=5"]))
    runs = sorted((work / "logs").glob("multi_accdoa_*/runs/*"))
    assert runs
    lines = [json.loads(l) for l in open(runs[-1] / "metrics.jsonl")]
    assert np.isfinite(lines[-1]["train"]["loss_all"])

    macro = infer_cli.main(_l3_overrides(l3das22_corpus, work,
                                         ["mode=valid", "seed=5"]))
    assert np.isfinite(macro["SELD_scr"])


# -------------------------------------------------------------------- STARSS23


@pytest.fixture(scope="module")
def starss23_corpus(tmp_path_factory):
    rng = np.random.default_rng(17)
    root = tmp_path_factory.mktemp("starss23_root")
    foa = root / "STARSS23" / "foa_dev"
    meta = root / "STARSS23" / "metadata_dev"
    foa.mkdir(parents=True)
    meta.mkdir(parents=True)
    FS = 24000
    for room, sec in (("fold3_room4", 21), ("fold4_room2", 17)):
        stem = f"{room}_mix001"
        sig = (rng.standard_normal((4, FS * sec)) * 2500).astype(np.int16)
        write_wav(foa / f"{stem}.wav", sig, FS)
        with open(meta / f"{stem}.csv", "w") as f:
            for frame in range(0, sec * 10 - 5, 2):
                # bursts of up to 5 simultaneous events: exercises the
                # STARSS23 6-track label tensor (max_polyphony=6)
                for t in range(int(rng.integers(1, 6))):
                    f.write(f"{frame},{int(rng.integers(0, 13))},{t},"
                            f"{int(rng.integers(-180, 180))},"
                            f"{int(rng.integers(-60, 60))}\n")
    return root


def _s23_overrides(root, work, extra=()):
    return [
        "data=starss23/default",
        "data.nfft=256", "data.n_mels=16",
        "data.train_dataset={STARSS23: [fold3_room4]}",
        "data.valid_dataset={STARSS23: [fold4_room2]}",
        "data.test_dataset={STARSS23: [fold4_room2]}",
        f"paths.dataset_dir={root}",
        f"paths.hdf5_dir={work}/_hdf5",
        f"paths.log_dir={work}/logs",
        "loss=multi_accdoa",
        "model=default",
        "model.kwargs.num_features=[8,8,16,16]",
        "model.num_decoder_layers=1",
        "model.batch_size=2",
        "num_workers=0",
    ] + list(extra)


def test_starss23_e2e(starss23_corpus, tmp_path_factory):
    work = tmp_path_factory.mktemp("s23_work")
    from cli_loader import load_cli
    import h5py

    preproc_cli = load_cli("preproc")
    preproc_cli.main(_s23_overrides(starss23_corpus, work,
                                    ["dataset=STARSS23", "wav_format=.wav"]))
    hdf5 = work / "_hdf5"
    assert (hdf5 / "data/24000fs/wav/dev/STARSS23_10sChunklen_10sHoplen_train.csv").exists()
    with h5py.File(hdf5 / "label/track/dev/STARSS23.h5") as hf:
        key = list(hf.keys())[0]
        # 6-track tensor (reference preprocess.py:80-133 STARSS23 branch)
        assert hf[f"{key}/sed_label"].shape[1] == 6

    train_cli = load_cli("train")
    infer_cli = load_cli("infer")
    train_cli.main(_s23_overrides(starss23_corpus, work, [
        "trainer.max_epochs=1", "trainer.precision=32-true", "seed=5"]))
    macro = infer_cli.main(_s23_overrides(starss23_corpus, work,
                                          ["mode=valid", "seed=5"]))
    assert np.isfinite(macro["SELD_scr"])
    assert macro["LE"] <= 180.0
