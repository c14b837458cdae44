"""SELDTask: the training/eval runtime (reference SELDModelModule +
BaseModelModule, src/models/model_module.py + components/model_module.py),
rebuilt as pure jitted step functions over a 1-D data mesh.

Step anatomy (reference common_step, model_module.py:47-68):
  host: [AugMix triplication] -> rotate/wavmix (waveform, numpy)
  device (one jit): fused logmelIV frontend -> TF augs (traced flags)
                    -> backbone/head forward -> loss -> grads -> optax update
Validation/test: device forward (+optional 16-way ACS rotation TTA), host-side
DCASE decode + SELD metrics (train/loop.py).
"""

import itertools
import logging

from typing import Any, Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..augment import (Crop, FreqShift, Rotation, RotationDevice, SpecAugment,
                       TrackMixDevice, WavMix)
from ..losses import build_loss
from ..models import build_model
from ..ops import make_extractor
from ..parallel.mesh import make_local_mesh, make_mesh, replicate, shard_batch
from .checkpoint import load_pretrained
from .optim import build_optimizer, trainable_mask

# canonical device-chain order; the reference shuffles chain order randomly
# (documented deviation). trackmix operates on FEATURES here, exactly like the
# reference's aug_TF chains (components/model_module.py:74-78).
TF_AUG_ORDER = ("specaug", "crop", "freqshift", "trackmix")


class TrainState(flax.struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


class SELDTask:
    def __init__(self, cfg, dataset_spec, steps_per_epoch: int = 1,
                 mesh=None, num_devices: Optional[int] = None):
        self.cfg = cfg
        self.num_classes = dataset_spec.num_classes
        self.max_ov = dataset_spec.max_ov
        self.label_res = dataset_spec.label_resolution
        self.method = cfg["model"]["method"]
        self.steps_per_epoch = steps_per_epoch

        precision = str(cfg.get("trainer", {}).get("precision", "32-true"))
        self.compute_dtype = jnp.bfloat16 if "bf16" in precision else jnp.float32

        self.model, self.meta = build_model(cfg, self.num_classes,
                                            dtype=self.compute_dtype)
        self.extractor = make_extractor(cfg)
        self.loss = build_loss(cfg["model"]["loss"])
        self.loss_type = cfg["model"]["loss"].get("loss_type", "loss_all")

        # augmentation registry (reference model_module.py:61-78)
        aug = cfg.get("augment", {"type": [], "AugMix": False})
        self.aug_type = list(aug.get("type", []) or [])
        self.augmix = bool(aug.get("AugMix", False))
        xy_ratio = cfg["data"]["sample_rate"] / cfg["data"]["hoplen"] * self.label_res
        self._np_rng = np.random.RandomState(cfg.get("seed", 2024))
        # device-side rotation: opt-in via rotate.on_device, and only legal
        # when wavmix is absent (the reference applies rotate BEFORE wavmix
        # on the host). Pop the knob BEFORE building the host Rotation —
        # wave_np.Rotation takes no such kwarg.
        rotate_cfg = _kw(aug.get("rotate"))
        on_device = rotate_cfg.pop("on_device", False)
        self.wave_augs = {
            "rotate": Rotation(**rotate_cfg, rng=self._np_rng),
            "wavmix": WavMix(**_kw(aug.get("wavmix")), rng=self._np_rng),
        }
        self.tf_augs = {
            "specaug": SpecAugment(xy_ratio=xy_ratio, **_kw(aug.get("specaug"))),
            "crop": Crop(**_kw(aug.get("crop"))),
            "freqshift": FreqShift(**_kw(aug.get("freqshift"))),
            # trackmix runs on-device only (TrackMixDevice inside the jitted
            # TF chain) — there is deliberately no host TrackMix instance
            "trackmix": TrackMixDevice(**_kw(aug.get("trackmix"))),
        }
        self.rotate_on_device = (on_device and "rotate" in self.aug_type
                                 and "wavmix" not in self.aug_type)
        self.rotate_device = RotationDevice(**rotate_cfg) if self.rotate_on_device             else None
        aug_tf = [a for a in self.aug_type if a in TF_AUG_ORDER]
        self.aug_tf_comb = []
        for n in range(1, len(aug_tf) + 1):
            self.aug_tf_comb += list(itertools.combinations(aug_tf, n))

        # opt-in tensor parallelism (additive trainer.tensor_parallel knob,
        # parallel/tp.py — no reference analogue): >1 trains over a 2-D
        # (data, model) mesh; eval stays on a 1-D data mesh (the serving
        # shard_map paths are written for pure batch sharding)
        tp = int((cfg.get("trainer") or {}).get("tensor_parallel", 1) or 1)
        if mesh is not None:
            self.mesh = mesh
            tp = mesh.shape.get("model", 1) if "model" in mesh.axis_names else 1
        elif tp > 1:
            from ..parallel.tp import make_mesh_2d

            n = num_devices if (num_devices or 0) > 0 else len(jax.devices())
            if n % tp:
                raise ValueError(f"tensor_parallel={tp} does not divide "
                                 f"{n} devices")
            self.mesh = make_mesh_2d(n // tp, tp)
        else:
            self.mesh = make_mesh(num_devices)
        self.tp_size = tp
        # validation runs the FULL set on every process (PARITY deviation #3),
        # so eval shards over the local mesh; train shards over the global one
        if tp > 1:
            self.eval_mesh = make_local_mesh(num_devices)
        elif mesh is not None or jax.process_count() == 1:
            self.eval_mesh = self.mesh
        else:
            self.eval_mesh = make_local_mesh(num_devices)
        self._repl = NamedSharding(self.mesh, P())
        self._batch_shard = NamedSharding(self.mesh, P("data"))
        # trainer.fused_forward: train with the fused Swin fwd+VJP kernels
        # (train/fused_forward.py; HTSAT incl. constant-scalar AdapterBit
        # via swin_block_adapt_vjp — LoRA/learnable-scalar flax). Default
        # "auto" (round-5 r9d full-step A/B: 46.92 vs 79.31 ms flax @B=32,
        # 1.69x — docs/PERF.md): fused on TPU backends whenever the model
        # supports it, flax otherwise. Explicit true enforces support
        # (raises if the config can't run fused); explicit false pins flax.
        ff = (cfg.get("trainer") or {}).get("fused_forward", "auto")
        from .fused_forward import supports_fused_train

        if isinstance(ff, str) and ff.lower() == "auto":
            # tp>1 excluded: the kernels consume FULL param matrices, and
            # Megatron-sharded params would be all-gathered per block
            self.fused_forward = (jax.default_backend() in ("tpu", "axon")
                                  and supports_fused_train(self.model)
                                  and self.tp_size == 1)
        else:
            self.fused_forward = (ff is True
                                  or str(ff).lower() in ("true", "1", "yes"))
            if self.fused_forward and (not supports_fused_train(self.model)
                                       or self.tp_size > 1):
                raise ValueError(
                    "trainer.fused_forward=true requires an HTSAT with zero "
                    "attn/proj/pos dropout, no LoRA / learnable-scalar "
                    "adapters (constant-scalar bottleneck adapters are "
                    "fused), and tensor_parallel=1")
        self._train_step_fn = None
        self._eval_step_fn = None
        self._eval_state_cache = None
        # no-max exp2 softmax guard (serving.guard): None = unresolved;
        # resolved once per task at first eval from the loaded checkpoint
        self._nomax = None
        self.tx = None

    # ------------------------------------------------------------------ init
    def _dummy_batch(self, batch_size: int = 2):
        data = self.cfg["data"]
        if self.extractor is not None:
            n = int(data["train_chunklen_sec"] * data["sample_rate"])
            c = 4 if data["audio_feature"] == "logmelIV" else 1
            return jnp.zeros((batch_size, c, n), jnp.float32)
        # offline features: (C, T, F)
        from ..models.factory import in_channels_for

        c = in_channels_for(data["audio_feature"])
        t = int(data["train_chunklen_sec"] / self.label_res
                * (self.label_res / (data["hoplen"] / data["sample_rate"])))
        return jnp.zeros((batch_size, c, t, data["n_mels"]), jnp.float32)

    def init_state(self, rng=None, ckpt_path: Optional[str] = None) -> TrainState:
        rng = rng if rng is not None else jax.random.PRNGKey(self.cfg.get("seed", 0))
        x = self._dummy_batch()
        feats = self.extractor(x) if self.extractor is not None else x
        # jit the init: eager flax init dispatches each op individually, which
        # is pathologically slow over remote-execution TPU relays
        variables = jax.jit(lambda r, f: self.model.init(
            {"params": r, "dropout": r, "patchout": r}, f, train=False))(rng, feats)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})

        pretrained = self.meta.get("pretrained_path")
        if ckpt_path:
            import os

            if os.path.isdir(str(ckpt_path)):  # our own orbax checkpoint
                import orbax.checkpoint as ocp

                # template-free restore: 'last' checkpoints also carry
                # opt_state/epoch for exact training resume — inference only
                # needs params + batch_stats
                restored = ocp.StandardCheckpointer().restore(
                    os.path.abspath(str(ckpt_path)))
                params = restored["params"]
                batch_stats = restored.get("batch_stats", {})
            else:  # torch checkpoint (reference-format .ckpt/.pth)
                from .checkpoint import load_seld_inference_ckpt

                variables = {"params": params, "batch_stats": batch_stats}
                variables, report = load_seld_inference_ckpt(variables, ckpt_path)
                params, batch_stats = variables["params"], variables.get("batch_stats", {})
        elif pretrained and _exists(pretrained):
            variables = {"params": params, "batch_stats": batch_stats}
            variables, report = load_pretrained(variables, pretrained, self.meta)
            params, batch_stats = variables["params"], variables.get("batch_stats", {})

        self.tx, self.lr_fn = build_optimizer(self.cfg, params, self.steps_per_epoch)
        opt_state = self.tx.init(params)
        state = TrainState(params=params, batch_stats=batch_stats,
                           opt_state=opt_state, step=jnp.zeros((), jnp.int32))
        if self.tp_size > 1:
            from ..parallel.tp import shard_train_state

            return shard_train_state(state, self.mesh, self.tx)
        return replicate(self.mesh, state)

    # ----------------------------------------------------------------- steps
    def _apply_tf_chain(self, key, feats, targets, flags, ov1_mask):
        """Apply TF augs in canonical order gated by traced booleans.

        Deviation from the reference: the random *order* shuffle of the chain
        (model_module.py:117-118) is replaced by a fixed canonical order with
        the same random subset — masking augs commute, so only the
        freqshift-vs-mask ordering differs stochastically.
        """
        for i, name in enumerate(TF_AUG_ORDER):
            if name not in self.aug_type:
                continue
            key, sub = jax.random.split(key)
            if name == "trackmix":
                aug_x, aug_t = self.tf_augs[name](sub, feats, targets, ov1_mask)
            else:
                aug_x, aug_t = self.tf_augs[name](sub, feats, targets)
            take = flags[i]
            feats = jnp.where(take, aug_x, feats)
            targets = {k: jnp.where(take, aug_t[k], v) if "label" in k else v
                       for k, v in targets.items()}
        return feats, targets

    def _forward_features(self, batch_x):
        if self.extractor is not None:
            return self.extractor(batch_x)
        return batch_x

    def _make_train_step(self, donate: bool = True):
        def train_step(state: TrainState, batch_x, targets, key, aug_flags,
                       ov1_mask):
            if self.rotate_device is not None:
                key, sub = jax.random.split(key)
                batch_x, targets = self.rotate_device(sub, batch_x, targets)
            feats = self._forward_features(batch_x)
            if self.augmix and self.aug_tf_comb:
                n = feats.shape[0] // 3
                k1, k2, key = jax.random.split(key, 3)
                f1, t1 = self._apply_tf_chain(
                    k1, feats[n:2 * n],
                    {k: v[n:2 * n] for k, v in targets.items()}, aug_flags[0],
                    ov1_mask[n:2 * n])
                f2, t2 = self._apply_tf_chain(
                    k2, feats[2 * n:],
                    {k: v[2 * n:] for k, v in targets.items()}, aug_flags[1],
                    ov1_mask[2 * n:])
                feats = jnp.concatenate([feats[:n], f1, f2], axis=0)
                targets = {k: (jnp.concatenate([v[:n], t1[k], t2[k]], axis=0)
                               if "label" in k else v)
                           for k, v in targets.items()}
            elif self.aug_tf_comb:
                key, sub = jax.random.split(key)
                feats, targets = self._apply_tf_chain(sub, feats, targets,
                                                      aug_flags[0], ov1_mask)

            # Freeze policy as stop_gradient (not just optax masking): frozen
            # leaves' weight-grad matmuls get dead-code-eliminated by XLA
            # instead of computed-then-zeroed — the backward pass only builds
            # dW for trainable leaves (activation grads still flow through
            # frozen weights unchanged). Matches the reference more closely
            # too: torch requires_grad=False params have no .grad, so
            # Lightning's gradient_clip_val norm never saw them — optax-only
            # masking fed REAL frozen grads into clip_by_global_norm.
            # trainable_mask is path-structural, so this resolves at trace
            # time; mask computation costs nothing at runtime.
            freeze_mask = trainable_mask(
                state.params, (self.cfg.get("adapt") or {}).get("method",
                                                                "none"))
            any_frozen = not all(jax.tree_util.tree_leaves(freeze_mask))

            def loss_fn(params):
                if any_frozen:
                    params = jax.tree_util.tree_map(
                        lambda q, m: q if m else jax.lax.stop_gradient(q),
                        params, freeze_mask)
                variables = {"params": params}
                mutable = []
                if state.batch_stats:
                    variables["batch_stats"] = state.batch_stats
                    mutable = ["batch_stats"]
                if self.fused_forward:
                    # trainer.fused_forward (additive knob): Swin blocks as
                    # fused fwd + custom-VJP Pallas kernels
                    from .fused_forward import htsat_fused_train_forward

                    preds, new_bs = htsat_fused_train_forward(
                        self.model, variables, feats,
                        dropout_rng=jax.random.fold_in(key, 1),
                        compute_dtype=self.model.dtype, mesh=self.mesh)
                    losses = self.loss(preds, targets)
                    return losses[self.loss_type], (losses, new_bs)
                out = self.model.apply(
                    variables, feats, train=True, mutable=mutable,
                    rngs={"dropout": jax.random.fold_in(key, 1),
                          "patchout": jax.random.fold_in(key, 2)})
                preds, new_vars = out if mutable else (out, {})
                losses = self.loss(preds, targets)
                return losses[self.loss_type], (losses, new_vars.get("batch_stats",
                                                                     state.batch_stats))

            (loss_val, (losses, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
            new_params = jax.tree_util.tree_map(
                lambda p, u: (p + u).astype(p.dtype),
                state.params, updates)
            new_state = state.replace(params=new_params, batch_stats=new_bs,
                                      opt_state=new_opt, step=state.step + 1)
            scalar_losses = {k: (v if isinstance(v, (int, float)) else v.astype(jnp.float32))
                             for k, v in losses.items()}
            return new_state, scalar_losses

        # donate=False for callers that re-trace the step inside an outer jit
        # (donation is ignored there and warns — e.g. bench_train's K-unroll)
        return jax.jit(train_step, donate_argnums=(0,) if donate else ())

    def _select_fused_eval(self):
        """The fused serving fn for this model on this backend (or None).

        On TPU, plain (no-adapter) transformer inference routes through the
        fused-block serving engines (serving/htsat|passt|einv2): profiling
        showed the flax forwards are copies/LN-bound, not matmul-bound;
        parity is pinned in tests/test_serving_fused.py."""
        from ..models import einv2_heads, heads

        if jax.default_backend() not in ("tpu", "axon"):  # axon = TPU relay
            return None, False
        from .. import serving

        def _plain(ad):
            # structural gate: the serving kernels implement the adapter-free
            # block, so what matters is whether the tree CARRIES adapters /
            # LoRA — not the method string (mono_finetune.yaml ships
            # method=mono_adapter with position=[], i.e. a plain model)
            return not (ad.lora or ad.mlp_adapter or ad.spatial_adapter)

        if (isinstance(self.model, heads.HTSAT)
                and self.model.adapt.kernels_support()):
            # plain models ride the optimized serving kernels; AdapterBit
            # trees route through the adapter eval kernel inside
            # htsat_fused_forward (constant-scalar gelu adapters only)
            return serving.htsat_fused_forward, True
        if isinstance(self.model, heads.PASST):
            return serving.passt_fused_forward, True
        if (isinstance(self.model, einv2_heads.HTSAT)
                and _plain(self.model.adapt)):
            return serving.einv2_htsat_fused_forward, True
        if (isinstance(self.model, heads.CRNN)
                and self.model.decoder in ("conformer", None, "None",
                                           "null", "identity")):
            # XLA-level rewrite (folded BNs, flattened conformer denses,
            # interp+mean matmul) — no Pallas, so adapters-free only
            return serving.crnn_fused_forward, False
        return None, False

    def _resolve_nomax(self, state, batch_x) -> None:
        """One-time no-max exp2 softmax guard (serving.guard; round-4 review
        item): before the fused eval step is built, probe the LOADED
        checkpoint's max attention logit on the first eval clips and force
        the guarded softmax if it runs hot (a silently-NaN footgun for
        unvalidated external checkpoints otherwise). No-op for non-attention
        models / CPU eval."""
        if self._nomax is not None:
            return
        fused_fn, attention = self._select_fused_eval()
        if fused_fn is None or not attention:
            self._nomax = True
            return
        from ..serving.guard import LOG2E, NOMAX_LOG2_LIMIT, resolve_nomax

        params, batch_stats = self._localize_for_eval(state)
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        feats = jax.jit(self._forward_features)(jnp.asarray(batch_x[:2]))
        ok = resolve_nomax(self.model, variables, feats)
        if not ok:
            logging.getLogger(__name__).warning(
                "nomax guard: probe max |attention logit| exceeds %.0f log2 "
                "units — fused serving falls back to the guarded (row-max) "
                "softmax for this checkpoint", NOMAX_LOG2_LIMIT)
        del LOG2E
        self._nomax = ok

    def _make_eval_step(self):
        # Multi-chip: shard_map runs the pallas grid per device shard (the
        # 5s-clip pairing becomes shard-local, same semantics as the
        # reference's per-GPU DDP batches).
        fused_fn, attention = self._select_fused_eval()
        use_fused = fused_fn is not None
        # nomax resolved by _resolve_nomax before the step is built; None
        # (unresolved, e.g. warmup paths) keeps the kernels' auto default
        guard_kw = {"nomax": self._nomax} if (use_fused and attention
                                              and self._nomax is False) else {}

        def eval_step(params, batch_stats, batch_x):
            feats = self._forward_features(batch_x)
            variables = {"params": params}
            if batch_stats:
                variables["batch_stats"] = batch_stats
            if use_fused:
                fwd = lambda v, f: fused_fn(  # noqa: E731
                    self.model, v, f, compute_dtype=self.model.dtype,
                    **guard_kw)
                if self.eval_mesh.size > 1:
                    from jax import shard_map
                    from jax.sharding import PartitionSpec as P

                    fwd = shard_map(fwd, mesh=self.eval_mesh,
                                    in_specs=(P(), P("data")),
                                    out_specs=P("data"), check_vma=False)
                return fwd(variables, feats)
            return self.model.apply(variables, feats, train=False)

        self._eval_core = eval_step  # un-jitted: reused by the ACS step
        return jax.jit(eval_step)

    # ---------------------------------------------------------------- public
    def jitted_loss(self):
        """One-dispatch loss for validation (eager per-op relay round-trips
        are ~25 ms each — CLAUDE.md); cached per task."""
        if getattr(self, "_jitted_loss_fn", None) is None:
            self._jitted_loss_fn = jax.jit(
                lambda preds, targets: self.loss(preds, targets))
        return self._jitted_loss_fn

    def sample_aug_flags(self) -> np.ndarray:
        """(2, len(TF_AUG_ORDER)) booleans: per-AugMix-copy random subset of the
        configured TF augs (reference augment_data, model_module.py:115-121)."""
        flags = np.zeros((2, len(TF_AUG_ORDER)), bool)
        if not self.aug_tf_comb:
            return flags
        for c in range(2):
            combo = self.aug_tf_comb[self._np_rng.randint(len(self.aug_tf_comb))]
            for i, name in enumerate(TF_AUG_ORDER):
                flags[c, i] = name in combo
        return flags

    def host_augment(self, batch_x: np.ndarray, targets: Dict) -> Tuple:
        """AugMix triplication + waveform augs, host-side (reference
        common_step model_module.py:47-57 + data_copy :83-90)."""
        if self.augmix:
            batch_x = np.concatenate([batch_x] * 3, axis=0)
            targets = {k: (np.concatenate([v] * 3, axis=0)
                           if isinstance(v, np.ndarray) else list(v) * 3)
                       for k, v in targets.items()}
        if "rotate" in self.aug_type and not self.rotate_on_device:
            batch_x, targets = self.wave_augs["rotate"](batch_x, targets)
        if "wavmix" in self.aug_type:
            batch_x, targets = self.wave_augs["wavmix"](batch_x, targets)
        return batch_x, targets

    def train_step(self, state, batch: Dict, key):
        return self.train_step_prepared(state, self.prepare_batch(batch), key)

    def prepare_batch(self, batch: Dict):
        """Host-side half of train_step: augmentation RNG draws, AugMix/
        waveform augs and device transfers. Deterministic as long as batches
        are prepared in loader order from ONE thread — fit's double-buffer
        pipeline runs this for batch N+1 while batch N's step executes."""
        batch_x = np.asarray(batch["data"], np.float32)
        targets = {k: v for k, v in batch.items() if k != "data"}
        # ov statistics are logged for the RAW loader batch (reference
        # training_step model_module.py:71-73) — AugMix triplication and
        # WavMix relabeling must not inflate them. The post-augment ov still
        # feeds ov1_mask below (mixed clips are no longer ov1).
        ov_raw = list(batch["ov"]) if "ov" in batch else None
        batch_x, targets = self.host_augment(batch_x, targets)
        label_targets = {k: jnp.asarray(v) for k, v in targets.items()
                         if isinstance(v, np.ndarray)}
        batch_x = shard_batch(self.mesh, jnp.asarray(batch_x))
        label_targets = shard_batch(self.mesh, label_targets)
        flags = jnp.asarray(self.sample_aug_flags())
        ov = targets.get("ov") or ["1"] * batch_x.shape[0]
        ov1_mask = shard_batch(self.mesh,
                               jnp.asarray(np.asarray(ov) == "1"))
        return batch_x, label_targets, flags, ov1_mask, ov_raw

    def train_step_prepared(self, state, prepared, key):
        """Dispatch half of train_step over an already-prepared batch."""
        if self._train_step_fn is None:
            self._train_step_fn = self._make_train_step()
        batch_x, label_targets, flags, ov1_mask, ov_raw = prepared
        new_state, losses = self._train_step_fn(state, batch_x, label_targets,
                                                key, flags, ov1_mask)
        return new_state, losses, ov_raw

    def _localize_for_eval(self, state):
        """Copies of params/batch_stats on the local eval mesh.

        In multi-process runs the train state lives replicated on the GLOBAL
        mesh; a jit cannot mix global-mesh params with local-mesh batches.
        Every process holds a full replica, so the fetch is local. Cached per
        state object (one new state per epoch)."""
        if self.eval_mesh is self.mesh:
            return state.params, state.batch_stats
        cached = self._eval_state_cache
        if cached is not None and cached[0] is state:
            return cached[1], cached[2]
        from ..parallel.mesh import replicate as _replicate

        params = _replicate(self.eval_mesh, jax.device_get(state.params))
        bs = _replicate(self.eval_mesh, jax.device_get(state.batch_stats))
        self._eval_state_cache = (state, params, bs)
        return params, bs

    def eval_step(self, state, batch: Dict, post_processing: Optional[str] = None):
        batch_x = jnp.asarray(np.asarray(batch["data"], np.float32))
        if self._eval_step_fn is None:
            self._resolve_nomax(state, batch_x)
            self._eval_step_fn = self._make_eval_step()
        # uneven final validation batches: NamedSharding requires the batch
        # dim divisible by the mesh, and the 5s-concat path (heads.py /
        # serving) needs an EVEN batch PER DEVICE (shard_map runs it
        # shard-locally) — pad with repeats to 2*mesh, slice preds back.
        # Known deviation: on the 5s-concat path the pad clips shift the
        # half-split pairing, so real clips in an uneven final batch can be
        # time-concatenated with a repeated pad clip; cross-half attention
        # then perturbs their predictions slightly vs the reference's
        # even-batch pairing (which would simply assert on odd batches).
        # Measured harmless (full-chain metric parity test passes).
        B = batch_x.shape[0]
        pad = (-B) % (2 * self.eval_mesh.size)
        if pad:
            batch_x = jnp.concatenate(
                [batch_x, jnp.repeat(batch_x[-1:], pad, axis=0)], axis=0)
        if post_processing == "ACS":
            out = self._acs_forward(state, batch_x)
        else:
            params, batch_stats = self._localize_for_eval(state)
            sharded = shard_batch(self.eval_mesh, batch_x)
            out = self._eval_step_fn(params, batch_stats, sharded)
        if pad:
            out = {k: v[:B] for k, v in out.items()}
        return out

    _ACS_SIGNS = ((1, 1, 1), (-1, 1, 1), (1, -1, 1), (-1, -1, 1),
                  (1, 1, -1), (-1, 1, -1), (1, -1, -1), (-1, -1, -1))

    @staticmethod
    def _acs_tables():
        """Per-variant channel-permutation/sign tables for the 16 ACS
        rotations, in the reference's enumeration order (8 sign combos x 2
        channel swaps, components/model_module.py:269-303). Input side:
        x_v[c] = in_sign[v,c] * x[in_perm[v,c]]. Output side: the DOA
        de-rotation is the 3x3 signed permutation out_mat[v] applied on the
        source-axis components."""
        trans = {(0, 1, 2): (1, 2, 3), (1, 0, 2): (3, 2, 1)}
        in_perm, in_sign, out_mat = [], [], []
        for sign_x, sign_y, sign_z in SELDTask._ACS_SIGNS:
            for (xx, yy, zz), (s_x, s_y, s_z) in trans.items():
                in_perm.append([0, s_x, s_y, s_z])
                in_sign.append([1.0, sign_y, sign_z, sign_x])
                m = np.zeros((3, 3), np.float32)
                for t, p in enumerate((xx, yy, zz)):
                    m[t, p] = (sign_x, sign_y, sign_z)[p]
                out_mat.append(m)
        return (np.asarray(in_perm, np.int32),
                np.asarray(in_sign, np.float32), np.stack(out_mat))

    def _make_acs_step(self):
        """One-dispatch ACS chunk: rotate V variants into the batch dim,
        forward once at V*B, de-rotate and sum on device. The variant tables
        ride as jit ARGS, so one compile serves every chunk.

        Flat ordering is (half, variant, item): position i and i + V*B/2
        carry the SAME variant and the item pair (b_j, b_{j + B/2}). That
        matters because the HTSAT 5s-concat trick (models/heads.py:114-118)
        concatenates batch halves in TIME and attention couples the halves —
        the reference's per-variant forwards pair (v, b_j) with
        (v, b_{j+B/2}) (components/model_module.py:272-284), and a
        variant-major fold would instead pair (v_i, b_j) with (v_{i+V/2},
        b_j), a numerically different composition (caught by
        test_acs_batched.py's trick-active case). B is always even here:
        eval_step pads to a multiple of 2*mesh.size."""
        core = self._eval_core
        key = "multi_accdoa" if self.method == "multi_accdoa" else "accdoa"
        tracks = 3 if key == "multi_accdoa" else 1
        mesh = self.eval_mesh

        def acs_step(params, batch_stats, batch_x, in_perm, in_sign, out_mat):
            V = in_perm.shape[0]
            B = batch_x.shape[0]
            xv = jnp.take(batch_x, in_perm.reshape(-1), axis=1)
            xv = xv.reshape(B, V, 4, -1) * in_sign[None, :, :, None]
            xv = xv.reshape(2, B // 2, V, 4, xv.shape[-1])
            xv = xv.transpose(0, 2, 1, 3, 4).reshape(V * B, 4, -1)
            if mesh.size > 1:
                from jax.sharding import NamedSharding
                from jax.sharding import PartitionSpec as P

                xv = jax.lax.with_sharding_constraint(
                    xv, NamedSharding(mesh, P("data", None, None)))
            y = core(params, batch_stats, xv)[key]
            T = y.shape[1]
            y = y.reshape(2, V, B // 2, T, tracks, 3, -1)
            y = y.transpose(1, 0, 2, 3, 4, 5, 6).reshape(
                V, B, T, tracks, 3, -1)
            y = jnp.einsum("vts,vbmrsc->vbmrtc", out_mat, y)
            return y.sum(0).reshape(B, T, -1)

        return jax.jit(acs_step)

    def _acs_forward(self, state, batch_x, chunk: Optional[int] = None):
        """16-way rotation test-time augmentation (reference
        components/model_module.py:269-303): 8 sign combos x 2 channel swaps,
        forward each, de-rotate outputs, average. Variants are folded into
        the batch dimension (``chunk`` per dispatch): 16 small dispatches
        with eager rotation ops between them collapse to 16/chunk full-batch
        dispatches — on the dev relay that is ~6x fewer round-trips, and on
        any backend the small-B forwards become MXU-efficient ones."""
        if self._eval_step_fn is None:
            self._resolve_nomax(state, batch_x)
            self._eval_step_fn = self._make_eval_step()
        if getattr(self, "_acs_step_fn", None) is None:
            self._acs_step_fn = self._make_acs_step()
        params, batch_stats = self._localize_for_eval(state)
        key = "multi_accdoa" if self.method == "multi_accdoa" else "accdoa"
        in_perm, in_sign, out_mat = self._acs_tables()
        if chunk is None:
            # cap the folded batch at ~512 ten-second clips to bound
            # activation memory; 16 % chunk == 0 keeps trace shapes to one
            B = int(batch_x.shape[0])
            chunk = next(c for c in (8, 4, 2, 1) if c * B <= 512 or c == 1)
        batch_x = shard_batch(self.eval_mesh, batch_x)
        total = None
        for v0 in range(0, len(in_perm), chunk):
            part = self._acs_step_fn(
                params, batch_stats, batch_x,
                jnp.asarray(in_perm[v0:v0 + chunk]),
                jnp.asarray(in_sign[v0:v0 + chunk]),
                jnp.asarray(out_mat[v0:v0 + chunk]))
            total = part if total is None else total + part
        return {key: total / len(in_perm)}


def _kw(cfg_entry) -> Dict:
    d = dict(cfg_entry or {})
    d.pop("_target_", None)
    return d


def _exists(path) -> bool:
    import os

    return bool(path) and os.path.exists(str(path))
