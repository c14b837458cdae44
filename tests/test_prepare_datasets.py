"""scripts/prepare_datasets.py: layout normalization + split-zip assembly.

Covers the reference's dataset-prep shell scripts' logic (reference
scripts/unzip_datasets.bash, prepare_dcase2021.bash, prepare_l3das22.bash)
without any network access: pure-Python split-zip reassembly (concat +
zip64-aware central-directory rewrite), one-level layout flattening,
the L3DAS22 train/dev/test rearrangement, and download checksumming.
"""

import shutil
import subprocess
import sys
import zipfile
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
import prepare_datasets as prep  # noqa: E402


def _make_split_zip(tmp_path: Path, files: dict, split_kb: int = 64):
    """Create a genuine multi-part archive with the zip CLI (min split 64k).

    NOTE the merge itself deliberately does NOT use `zip -s 0` like the
    reference scripts do: Info-ZIP 3.0's split merge is broken on this
    box (measured: a 5-segment set merges to a truncated, CRC-corrupt
    archive), which is exactly why prepare_datasets.py rewrites the
    central directory itself.
    """
    for name, payload in files.items():
        (tmp_path / name).write_bytes(payload)
    subprocess.run(
        ["zip", "-q", "-s", f"{split_kb}k", str(tmp_path / "arc.zip"),
         *files], check=True, cwd=tmp_path)
    parts = sorted(tmp_path.glob("arc.z[0-9][0-9]"))
    assert parts, "zip -s did not produce split parts"
    return tmp_path / "arc.zip"


@pytest.mark.skipif(shutil.which("zip") is None, reason="needs zip CLI")
def test_merge_split_zip_multifile(tmp_path):
    # Incompressible payloads so deflate can't collapse the splits; the
    # second entry's local header starts on a later disk than disk 0.
    rng = __import__("random").Random(0)
    files = {f"f{i}.bin": bytes(rng.getrandbits(8) for _ in range(90000))
             for i in range(3)}
    merged = prep._merge_split_zip(_make_split_zip(tmp_path, files))
    with zipfile.ZipFile(merged) as zf:
        assert zf.testzip() is None  # every CRC checks out
        for name, payload in files.items():
            assert zf.read(name) == payload


@pytest.mark.skipif(shutil.which("zip") is None, reason="needs zip CLI")
def test_merge_split_zip_zip64(tmp_path):
    # Streaming stdin makes Info-ZIP write zip64 end records + extras even
    # for small data, exercising the zip64 locator/EOCD rewrite path.
    payload = __import__("os").urandom(200000)
    proc = subprocess.run(
        ["zip", "-q", "-s", "64k", str(tmp_path / "arc.zip"), "-"],
        input=payload, check=True, cwd=tmp_path)
    del proc
    assert sorted(tmp_path.glob("arc.z[0-9][0-9]")), "expected split parts"
    merged = prep._merge_split_zip(tmp_path / "arc.zip")
    with zipfile.ZipFile(merged) as zf:
        assert zf.testzip() is None
        assert zf.read("-") == payload


def test_merge_unsplit_zip_is_passthrough(tmp_path):
    base = tmp_path / "arc.zip"
    with zipfile.ZipFile(base, "w") as zf:
        zf.writestr("x.txt", "hello")
    assert prep._merge_split_zip(base) == base


def test_flatten_one_level(tmp_path):
    d = tmp_path / "foa_dev"
    for split in ("dev-train", "dev-test"):
        sub = d / split
        sub.mkdir(parents=True)
        (sub / f"{split}_fold1.wav").write_bytes(b"w")
        (sub / "notes.txt").write_bytes(b"t")  # non-matching stays put
    moved = prep.flatten_one_level(d, "*.wav", subdir_prefix="dev-")
    assert moved == 2
    assert sorted(p.name for p in d.glob("*.wav")) == [
        "dev-test_fold1.wav", "dev-train_fold1.wav"]
    # Subdirs still holding non-matching files are preserved, not deleted.
    assert (d / "dev-train" / "notes.txt").exists()


def test_flatten_missing_parent_is_noop(tmp_path):
    assert prep.flatten_one_level(tmp_path / "absent", "*.wav") == 0


def test_l3das22_rearrangement(tmp_path):
    for outer, n in [("L3DAS22_Task2_train", 3), ("L3DAS22_Task2_dev", 2),
                     ("L3DAS22_Task2_test", 2)]:
        for inner in ("data", "labels"):
            sub = tmp_path / outer / outer / inner
            sub.mkdir(parents=True)
            ext = ".wav" if inner == "data" else ".csv"
            for i in range(n):
                (sub / f"{outer[-5:]}_{i}{ext}").write_bytes(b"x")
    (tmp_path / "L3DAS22_Task1_junk").mkdir()
    prep.prepare_l3das22(tmp_path, skip_preproc=True)
    assert len(list((tmp_path / "data_train").glob("*.wav"))) == 5
    assert len(list((tmp_path / "labels_train").glob("*.csv"))) == 5
    assert len(list((tmp_path / "data_test").glob("*.wav"))) == 2
    assert len(list((tmp_path / "labels_test").glob("*.csv"))) == 2
    assert not list(tmp_path.glob("L3DAS22_Task[12]*"))


def test_synth_skips_extracted_and_missing(tmp_path):
    (tmp_path / "test900_ov2").mkdir()  # looks extracted
    prep.prepare_synth(tmp_path, skip_preproc=True)  # nothing to do, no crash


def test_synth_split_names_match_reference_corpus():
    # 9 splits total: 7 split-zip trains/test1800, 2 plain test zips
    # (reference unzip_datasets.bash / prepare_DataSynthSELD.bash).
    assert len(prep.SYNTH_SPLIT_ZIPS) == 7 and len(prep.SYNTH_PLAIN_ZIPS) == 2
    all_names = set(prep.SYNTH_SPLIT_ZIPS + prep.SYNTH_PLAIN_ZIPS)
    assert {"train20000_ov1_1", "train20000_ov1_2", "train10000_ov2_1",
            "train10000_ov2_2", "train3500_ov3_1", "train3500_ov3_2",
            "test1800_ov1", "test900_ov2", "test360_ov3"} == all_names


def test_verify_checksum(tmp_path):
    p = tmp_path / "f.bin"
    p.write_bytes(b"pseldnets")
    import hashlib
    good = "md5:" + hashlib.md5(b"pseldnets").hexdigest()
    assert prep._verify_checksum(p, good)
    assert prep._verify_checksum(p, good.upper().replace("MD5", "md5"))
    assert not prep._verify_checksum(p, "md5:" + "0" * 32)
    assert prep._verify_checksum(p, "")          # no spec -> accept
    assert prep._verify_checksum(p, "nope:abc")  # unknown algo -> warn+accept


@pytest.mark.skipif(shutil.which("zip") is None, reason="needs zip CLI")
def test_merge_split_zip_100plus_parts(tmp_path):
    # .z01..z99 then .z100: part ordering must be numeric, not lexicographic
    # (lexicographic would sort z100 before z11).
    import os
    payload = os.urandom(int(6.8e6))  # ~104 parts at 64k
    (tmp_path / "big.bin").write_bytes(payload)
    subprocess.run(["zip", "-q", "-s", "64k", str(tmp_path / "arc.zip"),
                    "big.bin"], check=True, cwd=tmp_path)
    parts = prep._split_parts(tmp_path / "arc.zip")
    assert len(parts) > 100 and parts[0].name == "arc.z01"
    assert parts[99].name == "arc.z100"
    merged = prep._merge_split_zip(tmp_path / "arc.zip")
    with zipfile.ZipFile(merged) as zf:
        assert zf.testzip() is None
        assert zf.read("big.bin") == payload
