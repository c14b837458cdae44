#!/usr/bin/env python
"""Dataset acquisition + preprocessing driver.

One Python CLI covering the reference's five shell scripts
(reference scripts/unzip_datasets.bash, prepare_DataSynthSELD.bash,
prepare_dcase2021.bash, prepare_starss23.bash, prepare_l3das22.bash):

    python scripts/prepare_datasets.py synth      [--root datasets] [--skip-preproc]
    python scripts/prepare_datasets.py dcase2021  [--root datasets/DCASE2021]
    python scripts/prepare_datasets.py starss23   [--root datasets/STARSS23]
    python scripts/prepare_datasets.py l3das22    [--root datasets/L3DAS22]

Each subcommand: (1) fetches the archives when a downloader is available
(Zenodo via stdlib urllib — no zenodo_get dependency; L3DAS22 via the
kaggle CLI if configured, else it prints manual instructions), (2)
reassembles split-zip archives and extracts them, (3) flattens the
extracted layout into the tree the dataset descriptors expect
(pseldnets_tpu/data/datasets.py), and (4) runs `src/preproc.py` for every
dataset config the corpus needs. Steps that already look complete are
skipped, so the command is resumable after an interrupted download.

Archives already placed manually under --root are picked up without any
network access — downloading is only attempted for files that are absent.
"""

import argparse
import json
import shutil
import subprocess
import sys
import urllib.request
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# The 9 synth-corpus splits (reference prepare_DataSynthSELD.bash); the
# first 7 ship as split-zip archives (.z01.. + .zip), the last 2 as plain
# zips (reference unzip_datasets.bash).
SYNTH_SPLIT_ZIPS = [
    "test1800_ov1", "train10000_ov2_1", "train10000_ov2_2",
    "train20000_ov1_1", "train20000_ov1_2", "train3500_ov3_1",
    "train3500_ov3_2",
]
SYNTH_PLAIN_ZIPS = ["test900_ov2", "test360_ov3"]

ZENODO_RECORDS = {"dcase2021": "5476980", "starss23": "7880637"}

# Extra hydra-style overrides appended to every src/preproc.py invocation
# (-o/--override on the command line, e.g. -o wav_format=.flac).
EXTRA_OVERRIDES = []


def _log(msg):
    print(f"[prepare] {msg}", flush=True)


def _preproc(*overrides):
    cmd = [sys.executable, str(REPO / "src" / "preproc.py"), *overrides,
           *EXTRA_OVERRIDES]
    _log("run: " + " ".join(cmd[1:]))
    subprocess.run(cmd, check=True, cwd=REPO)


def _split_parts(base: Path):
    """base.z01..zNN in numeric order (zNN, zNNN for 100+ parts)."""
    parts = []
    for p in base.parent.glob(base.stem + ".z*"):
        suffix = p.name[len(base.stem) + 2:]
        if suffix.isdigit():
            parts.append((int(suffix), p))
    return [p for _, p in sorted(parts)]


def _merge_split_zip(base: Path) -> Path:
    """Reassemble base.z01..zNN + base.zip into a single base_agg.zip.

    The reference scripts shell out to `zip -s 0` for this
    (unzip_datasets.bash / prepare_dcase2021.bash), but Info-ZIP 3.0's
    split merge is broken on some builds (measured on this box: it drops
    segments and emits a CRC-corrupt archive — see tests). Instead we do
    the merge directly: split-zip segments are plain byte ranges of one
    logical archive, so concatenation recreates the stream, and only the
    central directory's (disk, offset) pairs and the end records need
    rewriting to single-disk form (zip64-aware). Local-header offsets are
    relative to their segment's start and include disk 0's 4-byte
    spanning marker, so each entry's new offset is segment_base + offset.
    """
    merged = base.with_name(base.stem + "_agg.zip")
    if merged.exists():
        return merged
    parts = _split_parts(base)
    if not parts:
        return base  # small archive, never actually split
    _log(f"merging {len(parts) + 1} segments of {base.name}")
    bases, pos = [], 0
    with open(merged, "wb") as out:
        for p in parts + [base]:
            bases.append(pos)
            with open(p, "rb") as f:
                shutil.copyfileobj(f, out)
            pos = out.tell()
    _rewrite_central_directory_single_disk(merged, bases)
    import zipfile
    with zipfile.ZipFile(merged) as zf:  # structural validation
        zf.infolist()
    return merged


def _rewrite_central_directory_single_disk(path: Path, bases):
    """Patch a concatenated split archive's central directory + end records
    so every (disk, offset) pair becomes (0, bases[disk] + offset)."""
    import struct

    with open(path, "r+b") as f:
        f.seek(0, 2)
        size = f.tell()
        tail_len = min(size, 66000)  # EOCD + max comment length
        f.seek(size - tail_len)
        tail = f.read(tail_len)
        i = tail.rfind(b"PK\x05\x06")
        if i < 0:
            raise RuntimeError(f"{path}: no end-of-central-directory record")
        eocd_pos = size - tail_len + i
        (_, disk, cd_disk, n_this, n_tot, cd_size,
         cd_off, _clen) = struct.unpack("<IHHHHIIH", tail[i:i + 22])

        # zip64 detection must key off the locator's PRESENCE, not off
        # sentinel values: streamed archives write zip64 end records even
        # when every 16/32-bit field still fits, and readers (including
        # stdlib zipfile) honor the locator whenever it exists.
        loc_pos = eocd_pos - 20
        loc = b""
        if loc_pos >= 0:
            f.seek(loc_pos)
            loc = f.read(20)
        zip64 = loc[:4] == b"PK\x06\x07"
        if zip64:
            _, z64_disk, z64_off, _ = struct.unpack("<IIQI", loc)
            z64_pos = bases[z64_disk] + z64_off
            f.seek(loc_pos)
            f.write(struct.pack("<IIQI", 0x07064B50, 0, z64_pos, 1))
            f.seek(z64_pos)
            z64 = f.read(56)
            if z64[:4] != b"PK\x06\x06":
                raise RuntimeError(f"{path}: zip64 EOCD record missing")
            (_, z64_size, vm, vn, zdisk, zcd_disk, zn_this, zn_tot,
             zcd_size, zcd_off) = struct.unpack("<IQHHIIQQQQ", z64)
            cd_start = bases[zcd_disk] + zcd_off
            n_tot, cd_size = zn_tot, zcd_size
            f.seek(z64_pos)
            f.write(struct.pack("<IQHHIIQQQQ", 0x06064B50, z64_size, vm, vn,
                                0, 0, zn_tot, zn_tot, zcd_size, cd_start))
            # Rewrite the 32-bit EOCD as a consistent single-disk record,
            # with sentinels for anything that no longer fits.
            f.seek(eocd_pos)
            f.write(struct.pack(
                "<IHHHHIIH", 0x06054B50, 0, 0,
                min(n_tot, 0xFFFF), min(n_tot, 0xFFFF),
                min(cd_size, 0xFFFFFFFF), min(cd_start, 0xFFFFFFFF), 0))
        else:
            cd_start = bases[cd_disk] + cd_off
            f.seek(eocd_pos)
            f.write(struct.pack("<IHHHHIIH", 0x06054B50, 0, 0, n_tot, n_tot,
                                cd_size, cd_start, 0))

        f.seek(cd_start)
        cd = bytearray(f.read(cd_size))
        p = 0
        for _ in range(n_tot):
            if cd[p:p + 4] != b"PK\x01\x02":
                raise RuntimeError(f"{path}: central directory walk lost sync")
            (_, _, _, _, _, _, _, _, csize, usize, fnlen, exlen, cmlen,
             dstart, _, _, off) = struct.unpack("<IHHHHHHIIIHHHHHII",
                                                cd[p:p + 46])
            extra_pos = p + 46 + fnlen
            if dstart == 0xFFFF or off == 0xFFFFFFFF:
                # zip64 extra field: u8 slots present for each 0xFFFF… field,
                # in order usize, csize, offset, then u4 disk.
                e = extra_pos
                end = extra_pos + exlen
                while e + 4 <= end:
                    hid, hlen = struct.unpack("<HH", cd[e:e + 4])
                    if hid == 0x0001:
                        q = e + 4
                        if usize == 0xFFFFFFFF:
                            q += 8
                        if csize == 0xFFFFFFFF:
                            q += 8
                        real_off = off
                        off_slot = None
                        if off == 0xFFFFFFFF:
                            off_slot = q
                            real_off = struct.unpack("<Q", cd[q:q + 8])[0]
                            q += 8
                        real_disk = dstart
                        if dstart == 0xFFFF:
                            real_disk = struct.unpack("<I", cd[q:q + 4])[0]
                            cd[q:q + 4] = struct.pack("<I", 0)
                        new_off = bases[real_disk] + real_off
                        if off_slot is not None:
                            cd[off_slot:off_slot + 8] = struct.pack("<Q",
                                                                    new_off)
                        elif new_off <= 0xFFFFFFFF:
                            cd[p + 42:p + 46] = struct.pack("<I", new_off)
                        else:
                            raise RuntimeError(
                                f"{path}: 32-bit offset slot overflows after "
                                "merge (entry needs a zip64 offset field)")
                        if dstart != 0xFFFF:
                            cd[p + 34:p + 36] = struct.pack("<H", 0)
                        break
                    e += 4 + hlen
                else:
                    raise RuntimeError(f"{path}: zip64 entry without extra")
            else:
                cd[p + 34:p + 36] = struct.pack("<H", 0)
                cd[p + 42:p + 46] = struct.pack("<I", bases[dstart] + off)
            p = extra_pos + exlen + cmlen
        f.seek(cd_start)
        f.write(cd)


def _extract(zip_path: Path, target: Path, done_marker: Path = None):
    if done_marker is not None and done_marker.exists():
        _log(f"skip extract {zip_path.name} ({done_marker.name} exists)")
        return
    _log(f"extract {zip_path.name} -> {target}")
    if shutil.which("unzip"):
        subprocess.run(["unzip", "-q", "-o", str(zip_path), "-d", str(target)],
                       check=True)
    else:
        import zipfile
        with zipfile.ZipFile(zip_path) as zf:
            zf.extractall(target)


def flatten_one_level(parent: Path, pattern: str, subdir_prefix: str = ""):
    """Move parent/<sub>/<pattern> files up into parent/, drop the subdirs.

    Mirrors the reference's `mv $D/*/*.wav $D && rm -r $D/dev-*` layout
    normalization (prepare_dcase2021.bash / prepare_starss23.bash) without
    assuming the split-folder names.
    """
    if not parent.is_dir():
        return 0
    moved = 0
    for sub in sorted(p for p in parent.iterdir() if p.is_dir()):
        if subdir_prefix and not sub.name.startswith(subdir_prefix):
            continue
        for f in sorted(sub.glob(pattern)):
            dest = parent / f.name
            if not dest.exists():
                shutil.move(str(f), str(dest))
                moved += 1
        if not any(p for p in sub.rglob("*") if p.is_file()):
            shutil.rmtree(sub)
    return moved


def _verify_checksum(path: Path, spec: str) -> bool:
    """Check a Zenodo-style checksum spec ('md5:<hex>', or '<algo>:<hex>')."""
    if not spec:
        return True
    algo, _, want = spec.partition(":")
    import hashlib
    try:
        h = hashlib.new(algo)
    except ValueError:
        _log(f"unknown checksum algo {algo!r} — skipping verification")
        return True
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest() == want.lower()


def _zenodo_download(recid: str, target: Path, only_missing=True):
    """Fetch a Zenodo record's files with urllib (no zenodo_get needed).

    Downloads stream into a .part file and are renamed into place only
    after the record's md5 verifies, so an interrupted run never leaves a
    partial file that the resume check would mistake for complete.
    """
    target.mkdir(parents=True, exist_ok=True)
    url = f"https://zenodo.org/api/records/{recid}"
    _log(f"query {url}")
    try:
        with urllib.request.urlopen(url, timeout=60) as r:
            record = json.load(r)
    except Exception as e:  # no egress / offline box
        _log(f"Zenodo unreachable ({e}).")
        _log(f"Place the record's files under {target} manually "
             f"(https://zenodo.org/records/{recid}) and re-run.")
        return False
    for entry in record.get("files", []):
        name = entry.get("key") or entry["filename"]
        dest = target / name
        if only_missing and dest.exists() and dest.stat().st_size > 0:
            _log(f"have {name}")
            continue
        link = entry["links"].get("self") or entry["links"]["download"]
        part = dest.with_name(dest.name + ".part")
        _log(f"download {name}")
        with urllib.request.urlopen(link, timeout=600) as r, open(part, "wb") as f:
            shutil.copyfileobj(r, f)
        if not _verify_checksum(part, entry.get("checksum", "")):
            part.unlink()
            raise RuntimeError(f"{name}: checksum mismatch after download — "
                               "re-run to retry")
        part.replace(dest)
    return True


def prepare_synth(root: Path, skip_preproc: bool):
    """Synthetic DataSynthSELD corpus (reference unzip_datasets.bash +
    prepare_DataSynthSELD.bash). Archives must already sit under --root
    (the reference leaves their download to the user as well)."""
    for name in SYNTH_PLAIN_ZIPS:
        z = root / f"{name}.zip"
        if z.exists():
            _extract(z, root, done_marker=root / name)
        else:
            _log(f"missing {z} — skipping (already extracted or not downloaded)")
    for name in SYNTH_SPLIT_ZIPS:
        z = root / f"{name}.zip"
        if (root / name).is_dir():
            _log(f"skip {name} (already extracted)")
            continue
        if not z.exists():
            _log(f"missing {z} — skipping")
            continue
        merged = _merge_split_zip(z)
        _extract(merged, root, done_marker=root / name)
        if merged != z:
            merged.unlink(missing_ok=True)
    if skip_preproc:
        return
    for name in SYNTH_SPLIT_ZIPS + SYNTH_PLAIN_ZIPS:
        if not (root / name).is_dir():
            _log(f"skip preproc of {name} (not extracted under {root})")
            continue
        _preproc(f"dataset={name}", f"paths.dataset_dir={root.resolve()}")


def prepare_dcase2021(root: Path, skip_preproc: bool):
    """DCASE2021 Task 3 (reference prepare_dcase2021.bash)."""
    _zenodo_download(ZENODO_RECORDS["dcase2021"], root)
    for stem in ["foa_dev", "mic_dev"]:
        z = root / f"{stem}.zip"
        if z.exists():
            merged = _merge_split_zip(z)
            _extract(merged, root, done_marker=root / stem / ".flat")
            if merged != z:
                merged.unlink(missing_ok=True)
    for stem in ["metadata_dev", "foa_eval", "mic_eval", "metadata_eval"]:
        z = root / f"{stem}.zip"
        if z.exists():
            _extract(z, root, done_marker=root / stem / ".flat")
    for d, pat in [("foa_dev", "*.wav"), ("mic_dev", "*.wav"),
                   ("metadata_dev", "*.csv"), ("foa_eval", "*.wav"),
                   ("mic_eval", "*.wav"), ("metadata_eval", "*.csv")]:
        n = flatten_one_level(root / d, pat)
        if n:
            _log(f"flattened {n} files in {d}")
        if (root / d).is_dir():
            (root / d / ".flat").touch()
    if not skip_preproc:
        _preproc("dataset=DCASE2021", "wav_format=.wav")
        _preproc("dataset=DCASE2021", "dataset_type=eval", "wav_format=.wav")


def prepare_starss23(root: Path, skip_preproc: bool):
    """STARSS23 (reference prepare_starss23.bash)."""
    _zenodo_download(ZENODO_RECORDS["starss23"], root)
    for stem in ["foa_dev", "mic_dev", "metadata_dev", "foa_eval", "mic_eval"]:
        z = root / f"{stem}.zip"
        if z.exists():
            _extract(z, root, done_marker=root / stem / ".flat")
    for d, pat in [("foa_dev", "*.wav"), ("mic_dev", "*.wav"),
                   ("metadata_dev", "*.csv")]:
        n = flatten_one_level(root / d, pat, subdir_prefix="dev-")
        if n:
            _log(f"flattened {n} files in {d}")
        if (root / d).is_dir():
            (root / d / ".flat").touch()
    if not skip_preproc:
        _preproc("dataset=STARSS23", "wav_format=.wav")


def prepare_l3das22(root: Path, skip_preproc: bool):
    """L3DAS22 Task 2 (reference prepare_l3das22.bash). Download needs the
    kaggle CLI + credentials; the layout rearrangement runs on whatever is
    already extracted under --root."""
    if not any(root.glob("L3DAS22_Task2_*")) and not (root / "data_train").is_dir():
        if shutil.which("kaggle"):
            subprocess.run(["kaggle", "datasets", "download", "-d",
                            "l3dasteam/l3das22", "-p", str(root),
                            "--force", "--unzip"], check=True)
        else:
            _log("kaggle CLI not found. Download L3DAS22 Task 2 manually "
                 "(https://www.kaggle.com/datasets/l3dasteam/l3das22), "
                 f"extract under {root}, and re-run.")
            return
    moves = [("L3DAS22_Task2_train", "data", "data_train"),
             ("L3DAS22_Task2_dev", "data", "data_train"),
             ("L3DAS22_Task2_test", "data", "data_test"),
             ("L3DAS22_Task2_train", "labels", "labels_train"),
             ("L3DAS22_Task2_dev", "labels", "labels_train"),
             ("L3DAS22_Task2_test", "labels", "labels_test")]
    for outer, inner, dest_name in moves:
        src = root / outer / outer / inner
        if not src.is_dir():
            continue
        dest = root / dest_name
        dest.mkdir(parents=True, exist_ok=True)
        n = 0
        for f in sorted(src.iterdir()):
            target = dest / f.name
            if not target.exists():
                shutil.move(str(f), str(target))
                n += 1
        _log(f"{outer}/{inner}: moved {n} files -> {dest_name}")
    for junk in sorted(root.glob("L3DAS22_Task[12]*")):
        shutil.rmtree(junk)
    if not skip_preproc:
        _preproc("dataset=L3DAS22", "wav_format=.wav", "data=l3das22/default")
        _preproc("dataset=L3DAS22", "dataset_type=eval", "wav_format=.wav",
                 "data=l3das22/default")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__,
                                 formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("corpus",
                    choices=["synth", "dcase2021", "starss23", "l3das22"])
    ap.add_argument("--root", type=Path, default=None,
                    help="dataset directory (default: datasets[/<CORPUS>])")
    ap.add_argument("--skip-preproc", action="store_true",
                    help="only download/extract/flatten; skip src/preproc.py")
    ap.add_argument("-o", "--override", action="append", default=[],
                    help="extra override forwarded to every src/preproc.py "
                         "call (repeatable), e.g. -o num_workers=0")
    args = ap.parse_args(argv)
    default_roots = {"synth": Path("datasets"),
                     "dcase2021": Path("datasets/DCASE2021"),
                     "starss23": Path("datasets/STARSS23"),
                     "l3das22": Path("datasets/L3DAS22")}
    root = args.root or default_roots[args.corpus]
    root.mkdir(parents=True, exist_ok=True)
    EXTRA_OVERRIDES.extend(args.override)
    {"synth": prepare_synth, "dcase2021": prepare_dcase2021,
     "starss23": prepare_starss23, "l3das22": prepare_l3das22}[args.corpus](
        root, args.skip_preproc)
    _log("done")


if __name__ == "__main__":
    main()
