"""Optimizer / LR-schedule factory.

Parity: reference BaseModelModule.configure_optimizers
(src/models/components/model_module.py:128-146) — any torch.optim name +
kwargs from cfg.model.optimizer, torch.optim.lr_scheduler StepLR /
MultiStepLR / CosineAnnealingLR stepped per epoch, optional two-group
`multi_opt` (sed_encoder vs rest), plus the adapter freeze policy
(reference src/models/accdoa.py:148-170) realized as optax masking.
"""

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax


def epoch_schedule(base_lr: float, sched_cfg: Optional[Dict],
                   steps_per_epoch: int) -> Callable:
    """torch lr_scheduler semantics, stepped once per epoch."""
    if not sched_cfg:
        return lambda step: base_lr
    method = sched_cfg.get("method", "StepLR")
    kw = dict(sched_cfg.get("kwargs", {}) or {})

    def epoch_of(step):
        return step // steps_per_epoch

    if method == "StepLR":
        size, gamma = int(kw.get("step_size", 30)), float(kw.get("gamma", 0.1))

        def fn(step):
            return base_lr * gamma ** (epoch_of(step) // size)
    elif method == "MultiStepLR":
        milestones = jnp.asarray(sorted(kw.get("milestones", [])))
        gamma = float(kw.get("gamma", 0.1))

        def fn(step):
            n = jnp.sum(epoch_of(step) >= milestones)
            return base_lr * gamma ** n
    elif method == "CosineAnnealingLR":
        t_max, eta_min = float(kw["T_max"]), float(kw.get("eta_min", 0.0))

        def fn(step):
            e = jnp.minimum(epoch_of(step), t_max)
            return eta_min + (base_lr - eta_min) * 0.5 * (1 + jnp.cos(jnp.pi * e / t_max))
    else:
        raise NotImplementedError(f"lr_scheduler '{method}'")
    return fn


def _torch_optimizer(method: str, lr, kwargs: Dict) -> optax.GradientTransformation:
    kw = dict(kwargs)
    kw.pop("lr", None)
    if method in ("AdamW",):
        return optax.adamw(lr, b1=kw.get("betas", (0.9, 0.999))[0],
                           b2=kw.get("betas", (0.9, 0.999))[1],
                           eps=kw.get("eps", 1e-8),
                           weight_decay=kw.get("weight_decay", 0.01))
    if method in ("Adam",):
        return optax.adam(lr, eps=kw.get("eps", 1e-8))
    if method == "SGD":
        return optax.sgd(lr, momentum=kw.get("momentum", 0.0),
                         nesterov=kw.get("nesterov", False))
    if method == "RMSprop":
        return optax.rmsprop(lr, decay=kw.get("alpha", 0.99), eps=kw.get("eps", 1e-8),
                             momentum=kw.get("momentum", 0.0))
    raise NotImplementedError(f"optimizer '{method}'")


def trainable_mask(params, adapt_method: str):
    """Freeze policy (reference accdoa.py:148-170): with 'adapter' in the adapt
    method, only biases, adapter/lora params, and the task head (tscam_conv/fc)
    train; mono_adapter with no adapter params present unfreezes everything."""
    if "adapter" not in (adapt_method or ""):
        return jax.tree_util.tree_map(lambda _: True, params)

    def has_adapter():
        for path, _ in jax.tree_util.tree_leaves_with_path(params):
            name = "/".join(p.key for p in path if hasattr(p, "key"))
            if "adapter" in name or "lora" in name:
                return True
        return False

    any_adapter = has_adapter()
    if adapt_method == "mono_adapter" and not any_adapter:
        return jax.tree_util.tree_map(lambda _: True, params)

    def mask_fn(path, leaf):
        name = "/".join(p.key for p in path if hasattr(p, "key"))
        leaf_name = name.rsplit("/", 1)[-1]
        if leaf_name == "bias" or "adapter" in name or "lora" in name:
            return True
        if "tscam_conv" in name or name.startswith("fc/") or "/fc/" in name:
            return True
        return False

    return jax.tree_util.tree_map_with_path(mask_fn, params)


def build_optimizer(cfg, params, steps_per_epoch: int):
    """-> (tx, lr_fn). Honors multi_opt two-group kwargs and grad clipping
    (trainer.gradient_clip_val clips by global norm, Lightning default)."""
    opt_cfg = cfg["model"]["optimizer"]
    sched_cfg = cfg["model"].get("lr_scheduler")
    method = opt_cfg["method"]
    kwargs = dict(opt_cfg.get("kwargs", {}) or {})
    base_lr = float(kwargs.get("lr", 1e-3))
    lr_fn = epoch_schedule(base_lr, sched_cfg, steps_per_epoch)

    if opt_cfg.get("multi_opt", False):
        kwargs1 = dict(opt_cfg.get("kwargs1", {}) or {})
        lr1 = float(kwargs1.get("lr", base_lr))
        lr1_fn = epoch_schedule(lr1, sched_cfg, steps_per_epoch)

        def label_fn(p):
            def lbl(path, _):
                name = "/".join(x.key for x in path if hasattr(x, "key"))
                return "sed" if "sed_encoder" in name else "rest"

            return jax.tree_util.tree_map_with_path(lbl, p)

        tx = optax.multi_transform(
            {"sed": _torch_optimizer(method, lr1_fn, kwargs1),
             "rest": _torch_optimizer(method, lr_fn, kwargs)},
            label_fn(params))
    else:
        tx = _torch_optimizer(method, lr_fn, kwargs)

    adapt_method = (cfg.get("adapt") or {}).get("method", "none")
    mask = trainable_mask(params, adapt_method)
    if not all(jax.tree_util.tree_leaves(mask)):
        labels = jax.tree_util.tree_map(lambda m: "train" if m else "freeze", mask)
        tx = optax.multi_transform({"train": tx, "freeze": optax.set_to_zero()},
                                   labels)

    clip = cfg.get("trainer", {}).get("gradient_clip_val")
    if clip:
        tx = optax.chain(optax.clip_by_global_norm(float(clip)), tx)
    return tx, lr_fn
