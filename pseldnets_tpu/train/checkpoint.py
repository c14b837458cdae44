"""Torch-checkpoint → flax-variables converter with the reference's load-time
weight surgery.

This is the correctness-critical compatibility layer (SURVEY §5.4): it ingests
the released AudioSet checkpoints (HTS-AT `HTSAT-fullset-imagenet-768d-32000hz`,
PaSST `passt-l-kd-ap.47`, PANNs `Cnn14_mAP=0.431`) and DataSynthSELD SELD
checkpoints, reproducing exactly:

* prefix strips `sed_model.` / `net.` / `_orig_mod.`   (reference accdoa.py:176,195-196)
* patch-embed first-conv replication across input channels scaled 1/C
  (accdoa.py:179-181; einv2.py:246-256)
* bn0 stats copied into every per-channel scalar BN     (accdoa.py:186-191)
* PaSST time/freq pos-embed center-crop or bilinear resize (accdoa.py:277-298)
* head/tscam/fc/adapter/lora key skips per load mode    (accdoa.py:192-202)

Layout transforms torch→flax: Linear (out,in)→(in,out); Conv2d (O,I,KH,KW)→
(KH,KW,I,O); Conv1d (O,I,K)→(K,I,O); LayerNorm weight→scale; GRU packed weights
kept in torch layout (models/common.TorchGRU consumes them verbatim).
"""

import re
from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np

try:
    import torch
except ImportError:  # torch is only needed when actually converting
    torch = None

import flax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# key translation: flax variable path -> torch state_dict key
# ---------------------------------------------------------------------------
_LIST_NAMES = ("layers", "blocks", "stitch", "stitch1", "stitch2",
               "sed_decoder", "doa_decoder", "fc_sed", "fc_doa")
_IDX_RE = re.compile(r"^(%s)_(\d+)$" % "|".join(_LIST_NAMES))

# conformer: flax submodule path -> torch sequential path (per ConformerBlock)
_CONFORMER_MAP = {
    ("ff1", "norm"): "sequential.0.module.sequential.0",
    ("ff1", "fc1"): "sequential.0.module.sequential.1",
    ("ff1", "fc2"): "sequential.0.module.sequential.4",
    ("attn_norm",): "sequential.1.module.layer_norm",
    ("attn", "query_proj"): "sequential.1.module.attention.query_proj",
    ("attn", "key_proj"): "sequential.1.module.attention.key_proj",
    ("attn", "value_proj"): "sequential.1.module.attention.value_proj",
    ("attn", "pos_proj"): "sequential.1.module.attention.pos_proj",
    ("attn", "out_proj"): "sequential.1.module.attention.out_proj",
    ("attn", "u_bias"): "sequential.1.module.attention.u_bias",
    ("attn", "v_bias"): "sequential.1.module.attention.v_bias",
    ("conv", "norm"): "sequential.2.module.sequential.0",
    ("conv", "pw_conv1"): "sequential.2.module.sequential.2.conv",
    ("conv", "dw_conv"): "sequential.2.module.sequential.4.conv",
    ("conv", "bn"): "sequential.2.module.sequential.5",
    ("conv", "pw_conv2"): "sequential.2.module.sequential.7.conv",
    ("ff2", "norm"): "sequential.3.module.sequential.0",
    ("ff2", "fc1"): "sequential.3.module.sequential.1",
    ("ff2", "fc2"): "sequential.3.module.sequential.4",
    ("final_norm",): "sequential.4",
}


def flax_to_torch_key(path: Tuple[str, ...]) -> Optional[str]:
    """Translate a flax variable path (without the collection prefix) into the
    reference's torch state_dict key. Returns None for params with no torch
    counterpart. The ScalarBN fused (C, F) layout is handled by the caller."""
    parts = list(path)

    # leaf normalization
    leaf = parts[-1]
    if leaf == "kernel":
        parts[-1] = "weight"
    elif leaf == "scale" and len(parts) >= 2:
        parts[-1] = "weight"

    out = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if p == "base":  # AdaptDense/AdaptConv wrapper
            i += 1
            continue
        if p == "bn" and out and (out[-1].startswith("bn") or out[-1] == "scalar"
                                  or out[-1].startswith("scalar")):
            i += 1  # TorchBatchNorm inner module of BatchNorm2d/ScalarBN
            continue
        m = _IDX_RE.match(p)
        if m:
            out.extend([m.group(1), m.group(2)])
            i += 1
            continue
        if p == "head_0":
            out.extend(["head", "0"])
            i += 1
            continue
        if p.startswith("decoder_layers_"):
            out.extend(["decoder", "layers", p.rsplit("_", 1)[1]])
            i += 1
            continue
        out.append(p)
        i += 1

    # conformer structural rewrite: …layers.N.<flax names> -> …layers.N.sequential…
    for span in range(2, 0, -1):
        for j in range(len(out) - span + 1):
            key = tuple(out[j:j + span])
            if key in _CONFORMER_MAP:
                prev_ok = j >= 2 and out[j - 2] == "layers" and out[j - 1].isdigit()
                if prev_ok:
                    out = out[:j] + _CONFORMER_MAP[key].split(".") + out[j + span:]
                    return ".".join(out)
    return ".".join(out)


def _to_flax_value(torch_key: str, val: np.ndarray, flax_path: Tuple[str, ...],
                   target_shape: Tuple[int, ...]) -> np.ndarray:
    """Apply the layout transform for this leaf."""
    leaf = flax_path[-1]
    v = np.asarray(val, dtype=np.float32)
    if leaf == "kernel":
        if v.ndim == 2:
            v = v.T
        elif v.ndim == 3:
            if len(target_shape) == 2:  # pointwise conv1d loaded into a Dense
                v = v[:, :, 0].T
            else:
                v = v.transpose(2, 1, 0)
        elif v.ndim == 4:
            v = v.transpose(2, 3, 1, 0)
    elif leaf in ("lora_A", "lora_B"):
        if v.ndim == 2 and v.shape != tuple(target_shape):
            v = v.T  # dense LoRA: torch (r,in)/(out,r) -> flax (in,r)/(r,out)
        elif v.ndim == 4:
            v = v.transpose(2, 3, 1, 0)  # conv LoRA sub-conv kernels
    if v.shape != tuple(target_shape):
        raise ValueError(
            f"shape mismatch for {torch_key} -> {'/'.join(flax_path)}: "
            f"{v.shape} vs {target_shape}")
    return v


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """torch.load with the reference's unwrap rules (ckpt['state_dict'] or
    ckpt['model'] or raw dict) and prefix strips."""
    assert torch is not None, "torch is required to convert checkpoints"
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        sd = ckpt["state_dict"]
    elif isinstance(ckpt, dict) and "model" in ckpt:
        sd = ckpt["model"]
    else:
        sd = ckpt
    return strip_prefixes({k: v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
                           for k, v in sd.items()})


def strip_prefixes(sd: Dict[str, Any]) -> Dict[str, Any]:
    out = {}
    for k, v in sd.items():
        for pre in ("sed_model.", "net.", "_orig_mod."):
            k = k.replace(pre, "")
        out[k] = v
    return out


def _flatten(variables) -> Dict[Tuple[str, ...], np.ndarray]:
    flat = flax.traverse_util.flatten_dict(flax.core.unfreeze(variables))
    return {tuple(map(str, k)): v for k, v in flat.items()}


def _unflatten(flat: Dict[Tuple[str, ...], Any]):
    return flax.traverse_util.unflatten_dict(flat)


def convert_state_dict(torch_sd: Dict[str, np.ndarray], variables,
                       prefix: str = "",
                       skip: Callable[[str], bool] = lambda k: False,
                       special: Optional[Dict[str, Callable]] = None,
                       strict: bool = True):
    """Fill flax `variables` (params + batch_stats) from a torch state dict.

    prefix: prepended to every generated torch key (e.g. 'encoder.').
    skip(torch_key): True -> keep the flax init value (reference's "Skipping…").
    special: torch_key -> fn(torch_sd, flax_path, target_shape) -> np.ndarray.
    Returns (new_variables, report dict).
    """
    special = special or {}
    flat = _flatten(variables)
    out = {}
    missing, skipped, used = [], [], set()
    for path, init_val in flat.items():
        coll, *rest = path
        rest_t = tuple(rest)
        tkey = flax_to_torch_key(rest_t)
        tkey = prefix + tkey if tkey else tkey

        # fused ScalarBN: flax (C, F) from torch scalar.{i}.<leaf> rows
        if "scalar" in rest_t:
            leaf = rest_t[-1]
            rows = []
            ok = True
            for c in range(init_val.shape[0]):
                rk = f"scalar.{c}.{leaf}"
                if rk not in torch_sd:
                    ok = False
                    break
                rows.append(np.asarray(torch_sd[rk], np.float32))
                used.add(rk)
            if ok:
                out[path] = np.stack(rows, axis=0)
                continue
            missing.append("scalar.*." + leaf)
            out[path] = init_val
            continue

        # flax MultiHeadDotProductAttention under TransformerEncoderLayer:
        # torch packs q/k/v as self_attn.in_proj_weight (3E, E) / in_proj_bias
        # (3E,), out as self_attn.out_proj.* (torch nn.TransformerEncoderLayer;
        # reference model_utilities.py:255-259)
        if "self_attn" in rest_t and rest_t[-1] in ("kernel", "bias") \
                and rest_t[rest_t.index("self_attn") + 1] in ("query", "key",
                                                              "value", "out"):
            i_sa = rest_t.index("self_attn")
            proj, leaf = rest_t[i_sa + 1], rest_t[-1]
            base = flax_to_torch_key(rest_t[:i_sa + 1] + ("x",)).rsplit(".", 1)[0]
            base = prefix + base
            if proj == "out":
                wk = f"{base}.out_proj.weight" if leaf == "kernel" \
                    else f"{base}.out_proj.bias"
            else:
                wk = f"{base}.in_proj_weight" if leaf == "kernel" \
                    else f"{base}.in_proj_bias"
            if skip(wk):
                skipped.append(wk)
                out[path] = init_val
                continue
            if wk not in torch_sd:
                missing.append(wk)
                out[path] = init_val
                continue
            v = np.asarray(torch_sd[wk], np.float32)
            used.add(wk)
            if proj == "out":
                v = v.T if leaf == "kernel" else v  # (E,E)->(E,E)=(h*d,E)
            else:
                E = v.shape[-1] if leaf == "kernel" else v.shape[0] // 3
                off = {"query": 0, "key": 1, "value": 2}[proj] * E
                v = v[off:off + E]
                if leaf == "kernel":
                    v = v.T  # torch (out,in) -> flax (in, h*d)
            out[path] = v.reshape(init_val.shape)
            continue

        if tkey in special:
            out[path] = special[tkey](torch_sd, rest_t, tuple(init_val.shape))
            used.add(tkey)
            continue
        if tkey is None or skip(tkey):
            skipped.append(tkey or "/".join(path))
            out[path] = init_val
            continue
        if tkey not in torch_sd:
            # conv LoRA: the reference packs lora_A/lora_B as nn.Conv2d
            # submodules, so the torch key carries a '.weight' suffix
            if rest_t[-1] in ("lora_A", "lora_B") and (tkey + ".weight") in torch_sd:
                tkey = tkey + ".weight"
            else:
                missing.append(tkey)
                out[path] = init_val
                continue
        out[path] = _to_flax_value(tkey, torch_sd[tkey], rest_t, tuple(init_val.shape))
        used.add(tkey)

    report = {
        "missing": missing,
        "skipped": skipped,
        "unused": [k for k in torch_sd if k not in used
                   and not k.endswith("num_batches_tracked")
                   and not k.endswith(".pe")
                   and not k.endswith("relative_position_index")
                   and not k.endswith("attn_mask")],
    }
    if strict and missing:
        raise KeyError(f"missing torch keys for flax params: {missing[:20]} "
                       f"({len(missing)} total)")
    return flax.core.freeze(_unflatten(out)) if isinstance(variables, flax.core.FrozenDict) \
        else _unflatten(out), report


# ---------------------------------------------------------------------------
# load-time surgery (AudioSet-pretrained encoders)
# ---------------------------------------------------------------------------
def _replicate_patch_embed(in_channels: int):
    """patch_embed.proj.weight: (O, 1, kh, kw) -> repeat across C and scale 1/C
    (reference accdoa.py:179-181), then to flax layout."""

    def fn(sd, flax_path, target_shape):
        w = np.asarray(sd["patch_embed.proj.weight"], np.float32)
        w = np.repeat(w, in_channels, axis=1) / in_channels if w.shape[1] == 1 else \
            np.tile(w, (1, in_channels // w.shape[1], 1, 1)) / (in_channels // w.shape[1])
        v = w.transpose(2, 3, 1, 0)
        assert v.shape == tuple(target_shape), (v.shape, target_shape)
        return v

    return fn


def _resize_pos_embed(key: str, axis: int):
    """PaSST pos-embed center-crop or bilinear resize (reference accdoa.py:277-298)."""

    def fn(sd, flax_path, target_shape):
        v = np.asarray(sd[key], np.float32)  # (1, E, F, 1) or (1, E, 1, T)
        ori, tgt = v.shape[axis], target_shape[axis]
        if ori >= tgt:
            start = int((ori - tgt) / 2)
            sl = [slice(None)] * 4
            sl[axis] = slice(start, start + tgt)
            return v[tuple(sl)]
        # bilinear resize along `axis` (other spatial axis has size 1)
        import jax

        tshape = list(v.shape)
        tshape[axis] = tgt
        return np.asarray(jax.image.resize(jnp.asarray(v), tshape, method="linear"))

    return fn


def load_pretrained(variables, ckpt_path: str, meta: Dict[str, Any], strict: bool = True):
    """Replicates the reference's `load_ckpts` for every (method, backbone) —
    dispatches on meta from models.factory.build_model."""
    sd = load_torch_state_dict(ckpt_path)
    backbone = meta["backbone"]
    in_ch = meta["in_channels"]
    audioset = meta.get("audioset_pretrain", True)

    if audioset:
        if backbone in ("HTSAT", "HTSAT_SEDDOA"):
            dual = meta.get("method") == "einv2" and backbone == "HTSAT"
            special = {}
            encs = (("sed_encoder.", 4), ("doa_encoder.", in_ch)) if dual \
                else (("encoder.", in_ch),)
            for pre, c in encs:
                special[pre + "patch_embed.proj.weight"] = _wrap_prefixed(
                    _replicate_patch_embed(c), pre)
            torch_like = {f"{pre}{k}": v for pre, _ in encs for k, v in sd.items()}
            torch_like.update({k: v for k, v in sd.items() if k.startswith("bn0")})
            # bn0 -> every scalar row (reference accdoa.py:186-191)
            for c in range(in_ch):
                for leaf in ("weight", "bias", "running_mean", "running_var"):
                    torch_like[f"scalar.{c}.{leaf}"] = sd[f"bn0.{leaf}"]
            skip = lambda k: (".tscam_conv" in k or k.startswith("tscam_conv")
                              or "head" in k or "adapter" in k or "lora" in k
                              or k.startswith("fc."))
            return convert_state_dict(torch_like, variables, skip=skip, special=special,
                                      strict=strict)
        if backbone == "PASST":
            dual = meta.get("method") == "einv2"
            encs = (("sed_encoder.", 4), ("doa_encoder.", in_ch)) if dual \
                else (("encoder.", in_ch),)
            special = {}
            for pre, c in encs:
                special[pre + "patch_embed.proj.weight"] = _wrap_prefixed(
                    _replicate_patch_embed(c), pre)
                special[pre + "time_new_pos_embed"] = _wrap_prefixed(
                    _resize_pos_embed("time_new_pos_embed", 3), pre)
                special[pre + "freq_new_pos_embed"] = _wrap_prefixed(
                    _resize_pos_embed("freq_new_pos_embed", 2), pre)
            torch_like = {f"{pre}{k}": v for pre, _ in encs for k, v in sd.items()}
            if "bn0.weight" in sd:
                for c in range(in_ch):
                    for leaf in ("weight", "bias", "running_mean", "running_var"):
                        torch_like[f"scalar.{c}.{leaf}"] = sd[f"bn0.{leaf}"]
            # PaSST ckpts: 'head.0.*' (a LayerNorm) is loaded, other head keys skipped
            skip = lambda k: (("head" in k and not re.search(r"head\.0\.(weight|bias)$", k))
                              or "adapter" in k or "lora" in k
                              or re.search(r"(^|\.)fc(_sed|_doa)?\.", k) is not None
                              or "stitch" in k or re.search(r"(^|\.)decoder", k) is not None)
            return convert_state_dict(torch_like, variables, skip=skip, special=special,
                                      strict=strict)
        if backbone in ("CRNN", "ConvConformer"):
            dual = meta.get("method") == "einv2"
            special = {}
            torch_like = dict()
            encs = (("sed_convs.", 4), ("doa_convs.", in_ch)) if dual \
                else (("convs.", in_ch),)
            for pre, c in encs:
                for k, v in sd.items():
                    torch_like[pre + k] = v
                special[pre + "conv_block1.conv1.weight"] = _wrap_prefixed(
                    _replicate_cnn_first_conv(c), pre)
            for c in range(in_ch):
                for leaf in ("weight", "bias", "running_mean", "running_var"):
                    torch_like[f"scalar.{c}.{leaf}"] = sd[f"bn0.{leaf}"]
            skip = lambda k: (re.search(r"(^|\.)fc", k) is not None or "stitch" in k
                              or re.search(r"(^|\.)decoder", k) is not None
                              or re.search(r"(sed|doa)_track", k) is not None)
            return convert_state_dict(torch_like, variables, skip=skip, special=special,
                                      strict=strict)
        raise NotImplementedError(backbone)

    # DataSynthSELD-pretrained: whole-model state dict with head skips
    # (reference accdoa.py:192-202 / einv2.py:264-272)
    skip = lambda k: (k.startswith(("fc.", "head", "tscam_conv.", "sed_tscam_conv."))
                      or "lora" in k or "adapter" in k or k.startswith("fc_sed")
                      or k.startswith("af_extractor"))
    return convert_state_dict(sd, variables, skip=skip, strict=False)


def load_seld_inference_ckpt(variables, ckpt_path: str, strict: bool = True):
    """Load a released SELD checkpoint (full model incl. heads) for inference —
    the reference does this via Lightning's load (infer.py + on_load_checkpoint
    compile-prefix strip, src/models/model_module.py:101-109)."""
    sd = load_torch_state_dict(ckpt_path)
    sd = {k: v for k, v in sd.items() if not k.startswith("af_extractor")}
    return convert_state_dict(sd, variables, strict=strict)


def _wrap_prefixed(fn, prefix):
    def wrapped(sd, flax_path, target_shape):
        stripped = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
        merged = dict(sd)
        merged.update(stripped)
        return fn(merged, flax_path, target_shape)

    return wrapped


def _replicate_cnn_first_conv(in_channels: int):
    def fn(sd, flax_path, target_shape):
        w = np.asarray(sd["conv_block1.conv1.weight"], np.float32)  # (O, 1|C0, 3, 3)
        rep = in_channels // w.shape[1]
        w = np.tile(w, (1, rep, 1, 1)) / rep
        return w.transpose(2, 3, 1, 0)

    return fn
