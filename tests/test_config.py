"""Config engine tests: composition must reproduce the Hydra semantics the
reference tree relies on (reference configs/train.yaml:3-24, experiment files)."""

import os

from pseldnets_tpu.config import compose

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


def test_base_train_compose():
    cfg = compose(CONFIG_DIR, "train", [])
    assert cfg.data.sample_rate == 24000
    assert cfg.model.backbone == "HTSAT"
    # loss/accdoa.yaml is @package _global_ and patches model.method
    assert cfg.model.method == "accdoa"
    assert cfg.model.loss._target_ == "loss.accdoa.Losses"
    assert cfg.seed == 2024
    assert cfg.task_name == "accdoa_HTSAT"
    assert cfg.trainer.gradient_clip_val == 1.0


def test_experiment_overrides_group_choice():
    cfg = compose(CONFIG_DIR, "train", ["experiment=synth_maccdoa"])
    # experiment redirects /loss -> multi_accdoa and /augment -> augmix
    assert cfg.model.method == "multi_accdoa"
    assert cfg.model.loss._target_ == "loss.multi_accdoa.Losses"
    assert cfg.augment.AugMix is True
    assert "wavmix" in cfg.augment.type
    # experiment body patches
    assert cfg.model.batch_size == 32
    assert cfg.trainer.max_epochs == 25
    assert cfg.model.lr_scheduler.kwargs.step_size == 20
    assert cfg.task_name == "multi_accdoa_HTSAT"


def test_cli_group_and_leaf_overrides():
    cfg = compose(
        CONFIG_DIR,
        "train",
        ["model=passt", "loss=multi_accdoa", "model.batch_size=16", "seed=7"],
    )
    assert cfg.model.backbone == "PASST"
    assert cfg.model.method == "multi_accdoa"
    assert cfg.model.batch_size == 16
    assert cfg.seed == 7
    assert cfg.task_name == "multi_accdoa_PASST"


def test_augment_group_self_include():
    cfg = compose(CONFIG_DIR, "train", ["augment=augmix1"])
    # augmix1 includes default.yaml then overrides type/AugMix
    assert cfg.augment.AugMix is True
    assert cfg.augment.type == ["specaug", "crop", "freqshift", "rotate"]
    assert cfg.augment.specaug["T"] == 40  # inherited from default.yaml


def test_infer_compose_and_add_override():
    cfg = compose(CONFIG_DIR, "infer", ["mode=test", "+foo.bar=3"])
    assert cfg.mode == "test"
    assert cfg.post_processing is None
    assert cfg.foo.bar == 3


def test_interpolation_and_rundir():
    cfg = compose(CONFIG_DIR, "train", [])
    assert "${" not in cfg.paths.output_dir
    assert cfg.paths.output_dir.startswith("./logs//accdoa_HTSAT/runs/")


def test_debug_overlay():
    cfg = compose(CONFIG_DIR, "train", ["debug=default"])
    assert cfg.task_name == "debug"
    assert cfg.trainer.limit_val_batches == 3
    assert cfg.trainer.detect_anomaly is True


def test_no_baked_unresolved_interpolations():
    """Regression: a consumer resolved before its dependency must not bake the
    dependency's raw ``${...}`` text (logger save_dir once became a literal
    '${hydra:runtime.output_dir}/tensorboard/' directory on disk)."""
    cfg = compose(CONFIG_DIR, "train",
                  ["paths.log_dir=/tmp/x/logs", "loss=multi_accdoa"])
    assert cfg.logger.tensorboard.save_dir == cfg.paths.output_dir + "/tensorboard/"
    bad = []

    def walk(n, p=""):
        if isinstance(n, dict):
            for k, v in n.items():
                walk(v, f"{p}{k}.")
        elif isinstance(n, list):
            for i, v in enumerate(n):
                walk(v, f"{p}{i}.")
        elif isinstance(n, str) and "${" in n:
            bad.append(f"{p[:-1]} = {n}")

    walk(dict(cfg))
    assert not bad, bad


def test_all_experiment_configs_compose():
    """Every experiment yaml (incl. the dcase2021/l3das22/starss23 transfer
    surface) must compose against the train root, and the config tree must
    match the reference's groups file-for-file (additive files excepted)."""
    import glob

    from pseldnets_tpu.config import compose

    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    exps = sorted(glob.glob(os.path.join(root, "experiment", "**", "*.yaml"),
                            recursive=True))
    assert len(exps) >= 21
    for f in exps:
        rel = os.path.relpath(f, os.path.join(root, "experiment"))[:-5]
        cfg = compose(root, "train", [f"experiment={rel}"])
        assert cfg["model"]["method"] in ("accdoa", "multi_accdoa", "einv2")
        assert cfg["trainer"]["max_epochs"] > 0

    # dataset-specific spot checks (reference configs/data/*)
    cfg = compose(root, "train", ["experiment=l3das22/maccdoa"])
    assert cfg["data"]["sample_rate"] == 32000 and cfg["data"]["hoplen"] == 320
    cfg = compose(root, "train", ["experiment=dcase2021/finetune_maccdoa"])
    assert cfg["model"]["kwargs"]["pretrained_path"].endswith(
        "mACCDOA-HTSAT-0.567.ckpt")
    cfg = compose(root, "train",
                  ["experiment=l3das22/finetune_maccdoa_ov1_adapterbit"])
    assert cfg["adapt"]["method"] == "adapter"
    cfg = compose(root, "train", ["experiment=starss23/maccdoa_augmix1"])
    assert cfg["augment"]["AugMix"] is True
