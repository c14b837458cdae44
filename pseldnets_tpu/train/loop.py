"""Training / validation / test loops (the Lightning-Trainer role).

Parity targets: reference src/models/model_module.py (training_step :70-81,
validation epoch end :111-146, test epoch end :165-180) and
components/model_module.py (pred_aggregation :177-222, dcase conversion
:224-240, move_avg :304-330), with orbax checkpoints monitoring
val/macro/SELD_scr (reference configs/callbacks/default.yaml:8-14).
"""

import json
import logging
import time
from collections import OrderedDict
from pathlib import Path
from typing import Dict, Optional

import jax
import numpy as np

from ..metrics import (SELDMetrics, accdoa_label_to_dcase_format,
                       convert_output_format_cartesian_to_polar,
                       get_accdoa_labels, get_multi_accdoa_labels,
                       multi_accdoa_to_dcase_format, to_metrics_format,
                       track_to_dcase_format, write_output_format_file)

log = logging.getLogger("pseldnets")


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


class Aggregator:
    """Decode accumulated step outputs into frame streams (pred_aggregation)."""

    def __init__(self, cfg, method, num_classes, label_res=0.1):
        self.cfg = cfg
        self.method = method
        self.num_classes = num_classes
        self.label_res = label_res
        self.outputs = []
        self.num_preds_per_chunk = int(cfg["data"]["test_chunklen_sec"] / label_res)

    def append(self, preds: Dict):
        self.outputs.append({k: np.asarray(v, np.float32) for k, v in preds.items()})

    def get_num_frames(self, x):
        return int(np.ceil(x / self.num_preds_per_chunk) * self.num_preds_per_chunk)

    def aggregate(self, paths_dict: Optional[OrderedDict] = None):
        thr = self.cfg.get("sed_threshold", 0.5)
        thr = np.asarray(thr, np.float32)
        K = self.num_classes
        if self.method == "accdoa":
            pred = np.concatenate([o["accdoa"] for o in self.outputs], axis=0)
            sed, doa = get_accdoa_labels(pred, K, thr)
            return sed.reshape(-1, K), doa.reshape(-1, 3 * K)
        if self.method == "einv2":
            sed = _sigmoid(np.concatenate([o["sed"] for o in self.outputs], axis=0))
            doa = np.concatenate([o["doa"] for o in self.outputs], axis=0)
            # keep only the top class per track, then threshold
            top = np.argmax(sed, axis=-1)
            mask = np.zeros_like(sed, bool)
            np.put_along_axis(mask, top[..., None], True, axis=-1)
            sed = (sed > thr) & mask
            B, T, tracks = sed.shape[:3]
            return (sed.reshape(B * T, tracks, -1),
                    doa.reshape(B * T, tracks, -1))
        if self.method == "multi_accdoa":
            pred = np.concatenate([o["multi_accdoa"] for o in self.outputs], axis=0)
            if self.cfg.get("post_processing") == "move_avg" and paths_dict:
                pred = self.move_avg(pred, paths_dict)
            sed, doa = get_multi_accdoa_labels(pred, K, thr)
            sed = sed.reshape(3, -1, K).transpose(1, 0, 2)  # (N*T, tracks, K)
            doa = doa.reshape(3, -1, 3 * K).transpose(1, 0, 2)
            return sed, doa
        raise NotImplementedError(self.method)

    def move_avg(self, preds, paths_dict):
        """Overlapped-chunk moving-average stitching (reference
        components/model_module.py:304-330)."""
        test_chunk = self.cfg["data"]["test_chunklen_sec"]
        test_hop = self.cfg["data"]["test_hoplen_sec"]
        assert test_chunk % test_hop == 0
        chunk_len = int(test_hop / self.label_res)
        outputs = []
        batch_ind = 0
        for seg_len in paths_dict.values():
            num_chunks = int(np.ceil((seg_len - test_chunk / self.label_res)
                                     / chunk_len)) + 1
            valid_chunks = int(np.ceil(seg_len / chunk_len))
            tgt_len = self.get_num_frames(seg_len)
            local = preds[batch_ind:batch_ind + num_chunks]
            pieces = []
            for i in range(valid_chunks):
                left = int(max(0, i - test_chunk // test_hop + 1))
                right = int(min(i + 1, num_chunks))
                stack = [local[j, (i - j) * chunk_len:(i - j + 1) * chunk_len]
                         for j in range(left, right)]
                pieces.append(np.mean(np.stack(stack, 0), axis=0))
            res = np.concatenate(pieces, axis=0)
            if res.shape[0] < tgt_len:
                res = np.concatenate(
                    [res, np.zeros((tgt_len - res.shape[0],) + res.shape[1:],
                                   res.dtype)], axis=0)
            else:
                res = res[:tgt_len]
            outputs.append(res)
            batch_ind += num_chunks
        return np.concatenate(outputs)[None]

    def to_dcase_polar(self, pred_sed, pred_doa):
        """(reference convert_to_dcase_format_polar :224-240)."""
        if self.method == "accdoa":
            d = accdoa_label_to_dcase_format(pred_sed, pred_doa, self.num_classes)
            return convert_output_format_cartesian_to_polar(d)
        if self.method == "einv2":
            azi = np.arctan2(pred_doa[..., 1], pred_doa[..., 0])
            ele = np.arctan2(pred_doa[..., 2],
                             np.sqrt(pred_doa[..., 0] ** 2 + pred_doa[..., 1] ** 2))
            return track_to_dcase_format(pred_sed, np.stack((azi, ele), axis=-1))
        if self.method == "multi_accdoa":
            sed = pred_sed.transpose(1, 0, 2)
            doa = pred_doa.transpose(1, 0, 2)
            d = multi_accdoa_to_dcase_format(sed, doa, nb_classes=self.num_classes)
            return convert_output_format_cartesian_to_polar(d)
        raise NotImplementedError(self.method)


class MeanMeter:
    """Deferred mean: device scalars are held un-fetched so updating never
    forces a per-step host sync (jax dispatch stays async); compute() fetches
    once at epoch end."""

    def __init__(self):
        self.values = []

    def update(self, v):
        self.values.append(v)

    def compute(self):
        if not self.values:
            return 0.0
        return float(np.mean([float(v) for v in self.values]))


def run_validation(task, datamodule, state, metrics: SELDMetrics,
                   compute_loss: bool = True, limit_batches=None):
    """-> (macro_dict, micro_dict, val_losses). Mirrors validation_step +
    on_validation_epoch_end. limit_batches truncates the loader (debug mode,
    reference configs/debug/default.yaml:20)."""
    agg = Aggregator(task.cfg, task.method, task.num_classes, task.label_res)
    val_losses = {k: MeanMeter() for k in task.loss.loss_dict_keys}
    post = task.cfg.get("post_processing")
    loss_fn = task.jitted_loss() if compute_loss else None
    loader = datamodule.val_dataloader()
    try:
        for bi, batch in enumerate(loader):
            if limit_batches is not None and bi >= limit_batches:
                break
            preds = task.eval_step(state, batch, post_processing=post)
            if compute_loss:
                import jax.numpy as jnp

                targets = {k: jnp.asarray(np.asarray(v))
                           for k, v in batch.items() if "label" in k}
                if targets:
                    # one jitted dispatch on the still-device preds (no
                    # host round-trip), queued BEFORE agg.append forces the
                    # blocking fetch; MeanMeter defers the scalar fetch to
                    # epoch end (eager per-op relay round-trips are ~25 ms
                    # each — CLAUDE.md)
                    losses = loss_fn(preds, targets)
                    for k, v in losses.items():
                        val_losses[k].update(v)
            agg.append(preds)
    finally:
        if hasattr(loader, "close"):
            loader.close()

    pred_sed, pred_doa = agg.aggregate(datamodule.paths_dict)
    metrics.reset()
    frame_ind = 0
    for path, loc_frames in datamodule.paths_dict.items():
        num_frames = agg.get_num_frames(loc_frames)
        if frame_ind + num_frames > len(pred_sed):
            break  # truncated stream under limit_batches: only score files
            # whose full padded chunk span is present (the guard must match
            # the num_frames advance below, not loc_frames)
        pred_dcase = agg.to_dcase_polar(pred_sed[frame_ind:frame_ind + loc_frames],
                                        pred_doa[frame_ind:frame_ind + loc_frames])
        gt_dcase = datamodule.valid_gt_dcaseformat[path]
        metrics.update_seld_scores(
            pred=to_metrics_format(pred_dcase, loc_frames),
            gt=to_metrics_format(gt_dcase, loc_frames))
        frame_ind += num_frames
    macro, _ = metrics.compute_seld_scores("macro")
    micro, _ = metrics.compute_seld_scores("micro")
    return macro, micro, {k: m.compute() for k, m in val_losses.items()}


def run_test(task, datamodule, state, submissions_dir: Path):
    """Mirrors test_step + on_test_epoch_end: write submission CSVs."""
    agg = Aggregator(task.cfg, task.method, task.num_classes, task.label_res)
    post = task.cfg.get("post_processing")
    for batch in datamodule.test_dataloader():
        agg.append(task.eval_step(state, batch, post_processing=post))
    pred_sed, pred_doa = agg.aggregate(datamodule.paths_dict)
    submissions_dir.mkdir(parents=True, exist_ok=True)
    frame_ind = 0
    for path, loc_frames in datamodule.paths_dict.items():
        num_frames = agg.get_num_frames(loc_frames)
        pred_dcase = agg.to_dcase_polar(pred_sed[frame_ind:frame_ind + loc_frames],
                                        pred_doa[frame_ind:frame_ind + loc_frames])
        write_output_format_file(submissions_dir / (Path(path).stem + ".csv"),
                                 pred_dcase)
        frame_ind += num_frames
    log.info("Results are saved to %s", submissions_dir)


class EarlyStopping:
    """Lightning-semantics EarlyStopping (reference
    configs/callbacks/early_stopping.yaml): active only when the composed
    callbacks.early_stopping block carries a ``_target_`` (i.e. the user
    added early_stopping.yaml to the callbacks defaults, as in the
    reference); the inert monitor/patience block in callbacks/default.yaml
    does not arm it."""

    def __init__(self, monitor, mode="min", patience=3, min_delta=0.0,
                 check_finite=True, stopping_threshold=None,
                 divergence_threshold=None, verbose=False, **_):
        self.monitor = monitor
        self.sign = -1.0 if mode == "min" else 1.0
        self.patience = int(patience)
        self.min_delta = abs(float(min_delta))
        self.check_finite = check_finite
        self.stopping_threshold = stopping_threshold
        self.divergence_threshold = divergence_threshold
        self.best = -float("inf")
        self.wait_count = 0

    def should_stop(self, metrics: Dict) -> Optional[str]:
        """-> stop reason, or None to continue. Call once per validation."""
        if self.monitor not in metrics:
            return None
        v = float(metrics[self.monitor])
        if self.check_finite and not np.isfinite(v):
            return f"{self.monitor} is not finite ({v})"
        if self.stopping_threshold is not None and \
                self.sign * v >= self.sign * float(self.stopping_threshold):
            return f"{self.monitor} reached stopping_threshold"
        if self.divergence_threshold is not None and \
                self.sign * v <= self.sign * float(self.divergence_threshold):
            return f"{self.monitor} crossed divergence_threshold"
        if self.sign * v > self.best + self.min_delta:
            self.best = self.sign * v
            self.wait_count = 0
            return None
        self.wait_count += 1
        if self.wait_count >= self.patience:
            return (f"{self.monitor} did not improve by {self.min_delta} "
                    f"over {self.patience} validations")
        return None


def make_early_stopping(cfg) -> Optional[EarlyStopping]:
    es_cfg = (cfg.get("callbacks") or {}).get("early_stopping") or {}
    if "_target_" not in es_cfg or not es_cfg.get("monitor"):
        return None
    return EarlyStopping(**{k: v for k, v in es_cfg.items()
                            if k != "_target_"})


class _PreparedBatchPipeline:
    """Double-buffer between host and device in the train loop: ONE
    background thread runs task.prepare_batch (AugMix/waveform augs +
    device transfers) for batch N+1 while batch N's dispatched step executes
    on the device. A single thread keeps the augmentation RNG draw order
    identical to the serial loop; the depth-2 queue bounds live batches."""

    def __init__(self, task, loader, depth: int = 2):
        import queue
        import threading

        self.loader = loader
        self.q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self.thread = threading.Thread(target=self._worker, args=(task,),
                                       daemon=True)
        self.thread.start()

    def _worker(self, task):
        try:
            for batch in self.loader:
                if self._stop.is_set():
                    return
                if not self._put(("ok", task.prepare_batch(batch))):
                    return
        except BaseException as e:  # surfaced to the consumer
            self._put(("err", e))
            return
        finally:
            self._put((None, None))

    def _put(self, item) -> bool:
        import queue

        while not self._stop.is_set():
            try:
                self.q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def __iter__(self):
        return self

    def __next__(self):
        kind, item = self.q.get()
        if kind == "err":
            raise item
        if kind is None:
            raise StopIteration
        return item

    def close(self):
        self._stop.set()
        import queue

        try:
            self.q.get_nowait()
        except queue.Empty:
            pass
        if hasattr(self.loader, "close"):
            self.loader.close()

    def __del__(self):
        self.close()


def effective_steps_per_epoch(datamodule, cfg) -> int:
    """Steps actually run per epoch, honoring trainer.limit_train_batches.
    The OPTIMIZER must be built with this same number — the per-epoch LR
    schedulers (StepLR etc.) map step -> epoch via steps_per_epoch, and the
    reference steps its scheduler once per real epoch regardless of the
    limit (Lightning semantics)."""
    steps = datamodule.steps_per_epoch()
    limit_train = cfg.get("trainer", {}).get("limit_train_batches")
    if limit_train:
        steps = max(int(steps * float(limit_train))
                    if limit_train <= 1 else int(limit_train), 1)
    return steps


def fit(task, datamodule, state, cfg, output_dir: Path):
    """Training loop: epochs of train steps + per-epoch validation + orbax
    checkpointing on val/macro/SELD_scr (min)."""
    import orbax.checkpoint as ocp

    trainer_cfg = cfg.get("trainer", {})
    max_epochs = int(trainer_cfg.get("max_epochs", 50))
    check_every = int(trainer_cfg.get("check_val_every_n_epoch", 1))
    steps_per_epoch = effective_steps_per_epoch(datamodule, cfg)

    from ..utils.utilities import flatten_metrics, instantiate_loggers

    # multi-process: checkpoints/metric files are written by process 0 only
    # (the state is fully replicated, and the saved trees are host numpy, so
    # a rank-zero save is complete; every process still runs validation —
    # PARITY deviation #3)
    is_main = jax.process_index() == 0
    loggers = instantiate_loggers(cfg.get("logger"), output_dir) if is_main else []
    limit_val = trainer_cfg.get("limit_val_batches")
    if limit_val is not None:
        limit_val = int(limit_val)

    early_stopping = make_early_stopping(cfg)
    ckpt_dir = (output_dir / "checkpoints").resolve()
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    checkpointer = ocp.StandardCheckpointer()
    metrics = SELDMetrics(nb_classes=task.num_classes, doa_threshold=20)
    metrics_log = output_dir / "metrics.jsonl"
    best_score = float("inf")
    key = jax.random.PRNGKey(cfg.get("seed", 0))
    stat = {"ov1": 0, "ov2": 0, "ov3": 0}

    # exact training resume (reference trainer.fit(ckpt_path=...)): a 'last'
    # checkpoint carries opt_state + epoch alongside the model variables
    epoch = 0
    resume = cfg.get("ckpt_path")
    if resume and Path(str(resume)).is_dir() and             (Path(str(resume)) / "opt_state").exists():
        restored = checkpointer.restore(
            Path(str(resume)).resolve(),
            jax.device_get({"params": state.params,
                            "batch_stats": state.batch_stats,
                            "opt_state": state.opt_state,
                            "step": state.step,
                            "epoch": 0, "best_score": 0.0}))
        state = state.replace(params=restored["params"],
                              batch_stats=restored["batch_stats"],
                              opt_state=restored["opt_state"],
                              step=jax.numpy.asarray(restored["step"]))
        epoch = int(restored["epoch"])
        best_score = float(restored["best_score"])
        log.info("resumed training from %s at epoch %d", resume, epoch)

    # num_sanity_val_steps (reference configs/debug/default.yaml:16, Lightning
    # semantics): run N validation batches (-1 = the full set) BEFORE training
    # starts, discarding the results — catches eval-path breakage up front
    sanity = int(trainer_cfg.get("num_sanity_val_steps", 0) or 0)
    if sanity and epoch < max_epochs:
        log.info("sanity validation pass (%s batches)",
                 "all" if sanity < 0 else sanity)
        run_validation(task, datamodule, state, metrics,
                       limit_batches=None if sanity < 0 else sanity)

    # jax.profiler trace hook (set profile: N in the config to capture the
    # first N train steps of the run into <output_dir>/profile)
    profile_steps = int(cfg.get("profile", 0) or 0)
    if profile_steps:
        jax.profiler.start_trace(str(output_dir / "profile"))

    loader = datamodule.train_dataloader(
        num_batches=steps_per_epoch * max(max_epochs - epoch, 0))
    pipeline = _PreparedBatchPipeline(task, loader)
    step_in_epoch = 0
    global_step = 0
    train_losses = {k: MeanMeter() for k in task.loss.loss_dict_keys}
    t0 = time.time()
    for prepared in pipeline:
        key, sub = jax.random.split(key)
        state, losses, ov = task.train_step_prepared(state, prepared, sub)
        global_step += 1
        if profile_steps and global_step == profile_steps:
            jax.block_until_ready(losses["loss_all"])
            jax.profiler.stop_trace()
            log.info("profiler trace written to %s", output_dir / "profile")
            profile_steps = 0
        for k, v in losses.items():
            train_losses[k].update(v)
        if ov is not None:
            for o in ov:
                stat[f"ov{o}"] = stat.get(f"ov{o}", 0) + 1
        step_in_epoch += 1
        if step_in_epoch < steps_per_epoch:
            continue

        # ---- epoch end ----
        epoch += 1
        step_in_epoch = 0
        lr = float(task.lr_fn(int(jax.device_get(state.step))))
        log_line = {"epoch": epoch, "lr": lr,
                    "train": {k: m.compute() for k, m in train_losses.items()},
                    "ov_stat": dict(stat), "wall_s": round(time.time() - t0, 1)}
        train_losses = {k: MeanMeter() for k in task.loss.loss_dict_keys}
        stat = {"ov1": 0, "ov2": 0, "ov3": 0}

        # start the device->host transfers for the per-epoch 'last' checkpoint
        # now so they overlap validation instead of blocking the save below
        for leaf in jax.tree_util.tree_leaves(
                (state.params, state.batch_stats, state.opt_state)):
            if hasattr(leaf, "copy_to_host_async"):
                leaf.copy_to_host_async()

        if epoch % check_every == 0:
            macro, micro, val_losses = run_validation(task, datamodule, state, metrics,
                                                      limit_batches=limit_val)
            log_line["val"] = {"macro": macro, "micro": micro, "losses": val_losses}
            log.info("epoch %d val/macro: %s", epoch,
                     {k: round(v, 4) for k, v in macro.items()})
            score = macro["SELD_scr"]
            if score < best_score and is_main:
                best_score = score
                checkpointer.save(ckpt_dir / f"epoch_{epoch:03d}",
                                  jax.device_get({"params": state.params,
                                                  "batch_stats": state.batch_stats}),
                                  force=True)
                # save_top_k=1 (reference configs/callbacks/default.yaml)
                checkpointer.wait_until_finished()
                import shutil

                for old in sorted(ckpt_dir.glob("epoch_*")):
                    if old.name != f"epoch_{epoch:03d}":
                        shutil.rmtree(old, ignore_errors=True)
        if is_main:
            checkpointer.save(ckpt_dir / "last",
                          jax.device_get({"params": state.params,
                                          "batch_stats": state.batch_stats,
                                          "opt_state": state.opt_state,
                                          "step": state.step,
                                          "epoch": epoch,
                                          "best_score": best_score}),
                          force=True)
        log.info("epoch %d/%d train: %s lr=%.2e", epoch, max_epochs,
                 {k: round(v, 4) for k, v in log_line["train"].items()}, lr)
        if is_main:
            with open(metrics_log, "a") as f:
                f.write(json.dumps(log_line) + "\n")
        flat = flatten_metrics(log_line)
        for lg in loggers:
            lg.log_metrics(flat, epoch)
        if early_stopping is not None and "val" in log_line:
            reason = early_stopping.should_stop(flat)
            if reason:
                log.info("early stopping at epoch %d: %s", epoch, reason)
                break
        if epoch >= max_epochs:
            break
    pipeline.close()
    for lg in loggers:
        lg.close()
    checkpointer.wait_until_finished()
    return state
