"""Full-chain SELD metric parity vs the reference pipeline (north star).

One tiny corpus + ONE set of converted weights is pushed through BOTH
complete inference pipelines and the FINAL macro/micro SELD numbers are
compared within 0.5% (SURVEY §6):

  ours:   src/infer.py  (datamodule -> extractor -> flax forward ->
          Aggregator decode/stitch -> metrics/seld.py)
  oracle: the reference torch chain, imported (never copied) from
          /root/reference — torch CRNN forward + pred_aggregation reshapes
          (src/models/components/model_module.py:207-216), move_avg
          stitching (:299-330), multi_accdoa_to_dcase_format +
          cartesian->polar (:225-231), to_metrics_format and the official
          SELDMetrics (src/utils/SELD_metrics.py).

This is the composition test the piecewise oracles (features, logits 1.8e-6,
decode, metric core) can't cover: aggregation order, chunk stitching,
threshold handling, gt construction.
"""

import sys, os, json
from collections import OrderedDict

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))

import numpy as np
import pytest

from flac_writer import write_flac
from reference_oracle import load_reference

load_reference()
import torch  # noqa: E402

FS = 16000
CLIP_SEC = 8
K = 4


def _make_corpus(root, rng, name, room, n_clips):
    foa = root / name / "foa"
    meta = root / name / "metadata"
    foa.mkdir(parents=True, exist_ok=True)
    meta.mkdir(parents=True, exist_ok=True)
    for i in range(n_clips):
        stem = f"{room}_mix{i:03d}"
        sig = (rng.standard_normal((4, FS * CLIP_SEC)) * 3000).astype(np.int16)
        write_flac(foa / f"{stem}.flac", sig, FS, blocksize=4096)
        with open(meta / f"{stem}.csv", "w") as f:
            for frame in range(0, CLIP_SEC * 10, 3):
                for t in range(int(rng.integers(1, 3))):
                    f.write(f"{frame},{int(rng.integers(0, K))},{t},"
                            f"{int(rng.integers(-180, 180))},"
                            f"{int(rng.integers(-60, 60))}\n")


def _overrides(corpus_root, work, extra=()):
    return [
        "data.sample_rate=16000", "data.nfft=256", "data.n_mels=16",
        "data.hoplen=160", "data.train_chunklen_sec=4",
        "data.train_hoplen_sec=4", "data.test_chunklen_sec=4",
        "data.test_hoplen_sec=4",
        "data.train_dataset={chain2_ov1: [fold0_room0]}",
        "data.valid_dataset={chain2_ov1: [fold1_room1]}",
        "data.test_dataset={chain2_ov1: [fold1_room1]}",
        f"paths.dataset_dir={corpus_root}",
        f"paths.hdf5_dir={work}/_hdf5",
        f"paths.log_dir={work}/logs",
        "loss=multi_accdoa",
        "model=default",
        "model.kwargs.num_features=[8,8,16,16]",
        "model.num_decoder_layers=1",
        "model.batch_size=2",
        "num_workers=0",
    ] + list(extra)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    rng = np.random.default_rng(11)
    corpus = tmp_path_factory.mktemp("datasets")
    # one dataset name used for both splits: valid rooms are fold1_room1
    _make_corpus(corpus, rng, "chain2_ov1", "fold0_room0", 2)
    _make_corpus(corpus, rng, "chain2_ov1", "fold1_room1", 3)
    with open(corpus / "cls_indices_train.tsv", "w") as f:
        for i in range(K):
            f.write(f"x\ty\tclass_{i}\n")
    work = tmp_path_factory.mktemp("work")

    from cli_loader import load_cli

    preproc_cli = load_cli("preproc")
    for extra in ([], ["data.test_hoplen_sec=2"]):
        preproc_cli.main(_overrides(corpus, work,
                                    ["dataset=chain2_ov1",
                                     "wav_format=.flac"] + extra))

    # reference torch model (multi-ACCDOA CRNN), weights scaled so tanh
    # outputs straddle the 0.5 SED threshold — exercises decode for real
    from models import multi_accdoa as ref_maccdoa
    from pseldnets_tpu.config import Config

    torch.manual_seed(3)
    tcfg = Config.wrap({
        "data": {"n_mels": 16, "sample_rate": 16000, "hoplen": 160,
                 "audio_feature": "logmelIV"},
        "model": {"decoder": "gru", "num_decoder_layers": 1},
        "adapt": {"method": "none"},
    })
    tmodel = ref_maccdoa.CRNN(tcfg, K, in_channels=7, encoder="CNN8",
                              num_features=[8, 8, 16, 16])
    with torch.no_grad():
        tmodel.fc.weight.mul_(30.0)
    g = torch.Generator().manual_seed(5)
    for m in tmodel.modules():
        if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm1d)):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.5)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)
    tmodel.eval()
    ckpt_path = work / "converted.ckpt"
    torch.save({"state_dict": tmodel.state_dict()}, ckpt_path)
    return corpus, work, tmodel, ckpt_path


def _reference_pipeline(cfg, datamodule, tmodel, move_avg=False):
    """The reference inference chain, driven by its own functions."""
    from utils.data_utilities import (
        get_multi_accdoa_labels, multi_accdoa_to_dcase_format,
        convert_output_format_cartesian_to_polar, to_metrics_format,
        load_output_format_file)
    from utils.SELD_metrics import SELDMetrics as RefSELDMetrics

    import jax.numpy as jnp

    from pseldnets_tpu.ops import make_extractor

    extractor = make_extractor(cfg)
    preds = []
    for batch in datamodule.val_dataloader():
        feats = np.asarray(extractor(jnp.asarray(batch["data"])), np.float32)
        with torch.no_grad():
            out = tmodel(torch.from_numpy(feats.copy()))
        preds.append(out["multi_accdoa"].detach().cpu())
    pred = torch.cat(preds, dim=0)

    paths_dict = datamodule.paths_dict
    label_res = 0.1
    chunk_frames = int(cfg["data"]["test_chunklen_sec"] / label_res)

    def get_num_frames(n):
        return int(np.ceil(n / chunk_frames) * chunk_frames)

    if move_avg:
        # reference components/model_module.py:299-330 (move_avg branch)
        tc, th = cfg["data"]["test_chunklen_sec"], cfg["data"]["test_hoplen_sec"]
        chunk_len = int(th / label_res)
        outputs, batch_ind = [], 0
        for seg_len in paths_dict.values():
            num_chunks = int(np.ceil((seg_len - tc / label_res) / chunk_len)) + 1
            valid_num_chunks = int(np.ceil(seg_len / chunk_len))
            tgt_seg_len = get_num_frames(seg_len)
            local = pred[batch_ind:batch_ind + num_chunks]
            res = []
            for i in range(valid_num_chunks):
                left = int(max(0, i - tc // th + 1))
                right = int(min(i + 1, num_chunks))
                pieces = [local[j, (i - j) * chunk_len:(i - j + 1) * chunk_len]
                          for j in range(left, right)]
                res.append(torch.stack(pieces, dim=0).mean(dim=0))
            res = torch.cat(res, dim=0)
            if res.shape[0] < tgt_seg_len:
                res = torch.cat([res, torch.zeros(tgt_seg_len - res.shape[0],
                                                  *res.shape[1:])], dim=0)
            else:
                res = res[:tgt_seg_len]
            outputs.append(res)
            batch_ind += num_chunks
        pred = torch.cat(outputs).unsqueeze(0)

    # pred_aggregation reshapes (components/model_module.py:207-216)
    thr = torch.tensor(cfg.get("sed_threshold", 0.5))
    sed, doa = get_multi_accdoa_labels(pred, K, thr)
    pred_sed = sed.reshape(sed.shape[0], sed.shape[1] * sed.shape[2],
                           -1).transpose(0, 1).numpy()
    pred_doa = doa.reshape(doa.shape[0], doa.shape[1] * doa.shape[2],
                           -1).transpose(0, 1).float().numpy()

    metrics = RefSELDMetrics(doa_threshold=20, nb_classes=K)
    frame_ind = 0
    for path, loc_frames in paths_dict.items():
        num_frames = get_num_frames(loc_frames)
        ps = pred_sed[frame_ind:frame_ind + loc_frames].transpose(1, 0, 2)
        pd = pred_doa[frame_ind:frame_ind + loc_frames].transpose(1, 0, 2)
        d = multi_accdoa_to_dcase_format(ps, pd, nb_classes=K)
        d = convert_output_format_cartesian_to_polar(in_dict=d)
        # gt straight from the raw metadata via the reference loader
        # (data/components/data.py:90-98)
        meta = os.path.splitext(str(path))[0].replace(
            os.sep + "foa" + os.sep, os.sep + "metadata" + os.sep) + ".csv"
        gt = load_output_format_file(meta)
        metrics.update_seld_scores(pred=to_metrics_format(d, loc_frames),
                                   gt=to_metrics_format(gt, loc_frames))
        frame_ind += num_frames
    macro, _ = metrics.compute_seld_scores("macro")
    micro, _ = metrics.compute_seld_scores("micro")
    return macro, micro


def _assert_within(ours, ref, rel=0.005):
    for key in ("ER", "F", "LE", "LR", "SELD_scr"):
        a, b = float(ours[key]), float(ref[key])
        scale = max(abs(b), 1e-2 if key != "LE" else 1.0)
        assert abs(a - b) <= rel * scale + 1e-9, (
            f"{key}: ours={a} ref={b} (>{rel*100}%)")


@pytest.mark.parametrize("move_avg", [False, True],
                         ids=["plain", "move_avg"])
def test_fullchain_metric_parity(setup, move_avg):
    corpus, work, tmodel, ckpt_path = setup
    from cli_loader import load_cli

    infer_cli = load_cli("infer")
    out_dir = work / ("infer_ma" if move_avg else "infer_plain")
    extra = ["mode=valid", f"ckpt_path={ckpt_path}",
             f"paths.output_dir={out_dir}"]
    if move_avg:
        extra += ["post_processing=move_avg", "data.test_hoplen_sec=2"]
    macro = infer_cli.main(_overrides(corpus, work, extra))
    results = json.loads((out_dir / "results.json").read_text())

    # oracle side on the SAME datamodule/batches
    from pseldnets_tpu.config import compose
    from pseldnets_tpu.data import SELDDataModule, get_dataset

    REPO = os.path.join(os.path.dirname(__file__), "..")
    cfg = compose(os.path.join(REPO, "configs"), "infer",
                  _overrides(corpus, work, extra))
    dataset = get_dataset("chain2_ov1", cfg)
    datamodule = SELDDataModule(cfg, dataset, stage="fit")
    ref_macro, ref_micro = _reference_pipeline(cfg, datamodule, tmodel,
                                               move_avg=move_avg)

    # the chain must produce real detections, not a degenerate all-empty run
    assert 0.0 < float(ref_macro["LR"]) and float(ref_macro["F"]) >= 0.0
    _assert_within(macro, ref_macro)
    _assert_within(results["micro"], ref_micro)
