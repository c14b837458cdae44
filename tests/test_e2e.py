"""End-to-end slice test: synthetic FLAC corpus -> preproc (indexes + labels)
-> 1-epoch training with augmentations -> valid inference with SELD metrics.

Exercises the full stack the way `python src/preproc.py && src/train.py &&
src/infer.py` does, on a tiny 16 kHz config and a CRNN backbone."""

import sys, os, json

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))

import numpy as np
import pytest

from flac_writer import write_flac

FS = 16000
CLIP_SEC = 8
K = 4  # classes


def _make_corpus(root, rng, name, room, n_clips):
    foa = root / name / "foa"
    meta = root / name / "metadata"
    foa.mkdir(parents=True)
    meta.mkdir(parents=True)
    for i in range(n_clips):
        stem = f"{room}_mix{i:03d}"
        sig = (rng.standard_normal((4, FS * CLIP_SEC)) * 3000).astype(np.int16)
        write_flac(foa / f"{stem}.flac", sig, FS, blocksize=4096)
        # frame-wise metadata: up to 2 events per frame
        with open(meta / f"{stem}.csv", "w") as f:
            n_frames = CLIP_SEC * 10
            for frame in range(0, n_frames, 3):
                n_ev = int(rng.integers(1, 3))
                for t in range(n_ev):
                    cls = int(rng.integers(0, K))
                    azi = int(rng.integers(-180, 180))
                    ele = int(rng.integers(-60, 60))
                    f.write(f"{frame},{cls},{t},{azi},{ele}\n")


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    rng = np.random.default_rng(7)
    root = tmp_path_factory.mktemp("datasets")
    _make_corpus(root, rng, "train2_ov1", "fold0_room0", 3)
    _make_corpus(root, rng, "test2_ov1", "fold1_room1", 2)
    with open(root / "cls_indices_train.tsv", "w") as f:
        for i in range(K):
            f.write(f"x\ty\tclass_{i}\n")
    return root


def _overrides(corpus_root, work, extra=()):
    return [
        "data.sample_rate=16000", "data.nfft=256", "data.n_mels=16",
        "data.hoplen=160", "data.train_chunklen_sec=4", "data.train_hoplen_sec=4",
        "data.test_chunklen_sec=4", "data.test_hoplen_sec=4",
        "data.train_dataset={train2_ov1: [fold0_room0]}",
        "data.valid_dataset={test2_ov1: [fold1_room1]}",
        "data.test_dataset={test2_ov1: [fold1_room1]}",
        f"paths.dataset_dir={corpus_root}",
        f"paths.hdf5_dir={work}/_hdf5",
        f"paths.log_dir={work}/logs",
        "model=default",
        "model.kwargs.num_features=[8,8,16,16]",
        "model.num_decoder_layers=1",
        "model.batch_size=2",
        "num_workers=0",
    ] + list(extra)


@pytest.fixture(scope="module")
def preprocessed(corpus, tmp_path_factory):
    work = tmp_path_factory.mktemp("work")
    from cli_loader import load_cli; preproc_cli = load_cli("preproc")

    for ds in ("train2_ov1", "test2_ov1"):
        preproc_cli.main(_overrides(corpus, work, [f"dataset={ds}",
                                                   "wav_format=.flac"]))
    hdf5 = work / "_hdf5"
    assert (hdf5 / "label/accdoa/dev/train2_ov1.h5").exists()
    assert (hdf5 / "label/adpit/dev/train2_ov1.h5").exists()
    assert (hdf5 / "label/track/dev/train2_ov1.h5").exists()
    assert (hdf5 / "data/16000fs/wav/dev/train2_ov1_4sChunklen_4sHoplen_train.csv").exists()
    return corpus, work


@pytest.mark.parametrize("method_override,exp_key", [
    ("loss=multi_accdoa", "multi_accdoa"),
    ("loss=accdoa", "accdoa"),
    ("loss=einv2_pit", "einv2"),
])
def test_train_and_infer_e2e(preprocessed, method_override, exp_key):
    corpus, work = preprocessed
    from cli_loader import load_cli; train_cli = load_cli("train")
    from cli_loader import load_cli; infer_cli = load_cli("infer")

    overrides = _overrides(corpus, work, [
        method_override, "augment=augmix", "trainer.max_epochs=1",
        "trainer.precision=32-true", "seed=3",
    ])
    train_cli.main(overrides)

    # find this method's run dir (task_name = <method>_<backbone>)
    method = method_override.split("=")[1].replace("einv2_pit", "einv2")
    runs = sorted((work / "logs").glob(f"{method}_*/runs/*"))
    assert runs, "no run dir created"
    run_dir = runs[-1]
    lines = [json.loads(l) for l in open(run_dir / "metrics.jsonl")]
    assert lines and "val" in lines[-1]
    assert np.isfinite(lines[-1]["train"]["loss_all"])
    ckpts = list((run_dir / "checkpoints").glob("*"))
    assert ckpts

    macro = infer_cli.main(_overrides(corpus, work, [
        method_override, "mode=valid", "seed=3"]))
    assert 0 <= macro["SELD_scr"] <= 1.5
    assert macro["LE"] <= 180.0

    # inference from the saved orbax checkpoint must load and score
    last = run_dir / "checkpoints" / "last"
    assert last.is_dir()
    macro2 = infer_cli.main(_overrides(corpus, work, [
        method_override, "mode=valid", "seed=3", f"ckpt_path={last}"]))
    assert np.isfinite(macro2["SELD_scr"])


def test_infer_acs_tta(preprocessed):
    """16-way rotation test-time augmentation path (post_processing=ACS)."""
    corpus, work = preprocessed
    from cli_loader import load_cli; infer_cli = load_cli("infer")

    macro = infer_cli.main(_overrides(corpus, work, [
        "loss=multi_accdoa", "mode=valid", "post_processing=ACS"]))
    assert np.isfinite(macro["SELD_scr"])


def test_infer_move_avg(preprocessed):
    """Overlapped-chunk moving-average stitching (test_hoplen < chunklen)."""
    corpus, work = preprocessed
    from cli_loader import load_cli; preproc_cli = load_cli("preproc")
    from cli_loader import load_cli; infer_cli = load_cli("infer")

    extra = ["data.test_hoplen_sec=2"]
    preproc_cli.main(_overrides(corpus, work, ["dataset=test2_ov1",
                                               "wav_format=.flac"] + extra))
    macro = infer_cli.main(_overrides(corpus, work, [
        "loss=multi_accdoa", "mode=valid", "post_processing=move_avg"] + extra))
    assert np.isfinite(macro["SELD_scr"])


def test_infer_test_mode_writes_submissions(preprocessed):
    corpus, work = preprocessed
    from cli_loader import load_cli; infer_cli = load_cli("infer")

    infer_cli.main(_overrides(corpus, work, ["loss=multi_accdoa", "mode=test"]))
    subs = sorted((work / "logs").glob("**/submissions/*.csv"))
    assert len(subs) >= 2
    # submission files are readable DCASE format
    from pseldnets_tpu.metrics import load_output_format_file

    for s in subs:
        load_output_format_file(s)


def test_train_resume(preprocessed):
    """Exact training resume from the full-state 'last' checkpoint."""
    from cli_loader import load_cli; train_cli = load_cli("train")

    corpus, work = preprocessed
    base = ["loss=multi_accdoa", "trainer.max_epochs=1", "seed=11",
            "task_name=resume_test"]
    train_cli.main(_overrides(corpus, work, base))
    runs = sorted((work / "logs").glob("resume_test/runs/*"))
    last = runs[-1] / "checkpoints" / "last"
    assert last.is_dir()
    # continue to epoch 2 from the saved state
    train_cli.main(_overrides(corpus, work, [
        "loss=multi_accdoa", "trainer.max_epochs=2", "seed=11",
        "task_name=resume_test", f"ckpt_path={last}"]))
    runs2 = sorted((work / "logs").glob("resume_test/runs/*"))
    lines = [json.loads(l) for l in open(runs2[-1] / "metrics.jsonl")]
    assert lines[-1]["epoch"] == 2


def _make_ov1_corpus(root, rng, name, room, n_clips):
    """Strictly single-source corpus (mono_adapter asserts <=1 event/frame)."""
    foa = root / name / "foa"
    meta = root / name / "metadata"
    foa.mkdir(parents=True)
    meta.mkdir(parents=True)
    for i in range(n_clips):
        stem = f"{room}_mix{i:03d}"
        sig = (rng.standard_normal((4, FS * CLIP_SEC)) * 3000).astype(np.int16)
        write_flac(foa / f"{stem}.flac", sig, FS, blocksize=4096)
        with open(meta / f"{stem}.csv", "w") as f:
            for frame in range(0, CLIP_SEC * 10, 4):
                cls = int(rng.integers(0, K))
                f.write(f"{frame},{cls},0,{int(rng.integers(-180, 180))},"
                        f"{int(rng.integers(-60, 60))}\n")


def test_mono_adapter_spatialization(tmp_path_factory):
    """mono_adapter training path: on-the-fly spatialization of clips into
    synthetic FOA with matching single-source labels (reference
    src/data/data.py:17-59, adapt=mono_adapter)."""
    from cli_loader import load_cli; preproc_cli = load_cli("preproc")
    from cli_loader import load_cli; train_cli = load_cli("train")

    rng = np.random.default_rng(17)
    root = tmp_path_factory.mktemp("mono_ds")
    work = tmp_path_factory.mktemp("mono_work")
    _make_ov1_corpus(root, rng, "mono2_ov1", "fold0_room0", 2)
    _make_ov1_corpus(root, rng, "monotest_ov1", "fold1_room1", 1)
    with open(root / "cls_indices_train.tsv", "w") as f:
        for i in range(K):
            f.write(f"x\ty\tclass_{i}\n")
    mono_over = [
        "data.train_dataset={mono2_ov1: [fold0_room0]}",
        "data.valid_dataset={monotest_ov1: [fold1_room1]}",
        "data.test_dataset={monotest_ov1: [fold1_room1]}",
    ]
    for ds in ("mono2_ov1", "monotest_ov1"):
        preproc_cli.main(_overrides(root, work, mono_over
                                    + [f"dataset={ds}", "wav_format=.flac"]))
    train_cli.main(_overrides(root, work, mono_over + [
        "loss=accdoa", "adapt=mono_adapter", "trainer.max_epochs=1", "seed=9",
        "task_name=mono_test"]))
    runs = sorted((work / "logs").glob("mono_test/runs/*"))
    lines = [json.loads(l) for l in open(runs[-1] / "metrics.jsonl")]
    assert np.isfinite(lines[-1]["train"]["loss_all"])
