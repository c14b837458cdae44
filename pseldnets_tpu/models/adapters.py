"""AdapterBit / LoRA parameter-efficient tuning modules.

Parity targets (reference src/models/components/model_utilities_adapt.py):
* Adapter — bottleneck MLP (down-proj → GELU → zero-init up-proj), output scaled
  by a constant or learnable scalar; inserted parallel to transformer MLPs
  ("MlpAdapter") and after attention proj ("SpatialAdapter")    (:7-42)
* LoRA Dense/Conv — low-rank residual A·B with alpha/r scaling; replaces
  qkv/proj/patch-merge/patch-embed layers when method contains 'lora' (:45-158)

In JAX the train/eval merge-unmerge dance of torch LoRA is unnecessary: the
forward always computes base + lora terms and freezing happens via optax masks
(see train/optim.py), which keeps the whole model a pure function.
"""

from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


def _act(name: str) -> Callable:
    # exact-erf gelu: the reference's nn.GELU() default (flax nn.gelu defaults
    # to the tanh approximation, which costs ~1e-3-scale parity noise)
    return {"gelu": lambda x: nn.gelu(x, approximate=False),
            "relu": nn.relu, "tanh": jnp.tanh}[str(name).lower()]


class Adapter(nn.Module):
    """Bottleneck adapter. Param names (fc1/fc2/scale) chosen so converted torch
    checkpoints that carry adapters map 1:1."""

    dim: int
    mlp_ratio: float = 0.25
    adapter_scalar: Any = "learnable_scalar"  # float | 'learnable_scalar'
    act_layer: str = "gelu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        hidden = int(self.dim * self.mlp_ratio)
        h = nn.Dense(hidden, dtype=self.dtype, name="fc1")(x)
        h = _act(self.act_layer)(h)
        # zero-init up-projection: the adapter starts as an identity residual
        h = nn.Dense(self.dim, dtype=self.dtype, name="fc2",
                     kernel_init=nn.initializers.zeros)(h)
        if self.adapter_scalar == "learnable_scalar":
            scale = self.param("scale", nn.initializers.ones, (1,), jnp.float32)
            h = h * scale
        else:
            h = h * float(self.adapter_scalar)
        return h


class AdaptDense(nn.Module):
    """nn.Dense with optional LoRA residual (rank r, scaling alpha/r).

    Torch-side keys: weight/bias plus lora_A (r, in) and lora_B (out, r)
    (reference model_utilities_adapt.py:45-104). Flax params: kernel/bias plus
    lora_A (in, r) and lora_B (r, out).
    """

    features: int
    use_bias: bool = True
    lora_r: int = 0
    lora_alpha: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = nn.Dense(self.features, use_bias=self.use_bias, dtype=self.dtype,
                     name="base")(x)
        if self.lora_r > 0:
            a = self.param("lora_A", nn.initializers.kaiming_uniform(),
                           (x.shape[-1], self.lora_r), jnp.float32)
            b = self.param("lora_B", nn.initializers.zeros,
                           (self.lora_r, self.features), jnp.float32)
            scaling = self.lora_alpha / self.lora_r
            y = y + (x @ a.astype(self.dtype)) @ b.astype(self.dtype) * scaling
        return y


class AdaptConv(nn.Module):
    """nn.Conv with optional LoRA residual (as in reference Conv2d LoRA)."""

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int]
    padding: Any = "VALID"
    use_bias: bool = True
    lora_r: int = 0
    lora_alpha: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = nn.Conv(self.features, kernel_size=tuple(self.kernel_size),
                    strides=tuple(self.strides), padding=self.padding,
                    use_bias=self.use_bias, dtype=self.dtype, name="base")(x)
        if self.lora_r > 0:
            kh, kw = self.kernel_size
            cin = x.shape[-1]
            # reference packs conv LoRA as (r*kh, cin*kw) x (out*kh, r*kw) and
            # reshapes to the conv kernel; equivalent low-rank conv residual:
            a = self.param("lora_A", nn.initializers.kaiming_uniform(),
                           (kh, kw, cin, self.lora_r), jnp.float32)
            b = self.param("lora_B", nn.initializers.zeros,
                           (1, 1, self.lora_r, self.features), jnp.float32)
            scaling = self.lora_alpha / self.lora_r
            import jax.lax as lax
            dn = lax.conv_dimension_numbers(x.shape, a.shape, ("NHWC", "HWIO", "NHWC"))
            pad = self.padding if isinstance(self.padding, str) else tuple(self.padding)
            low = lax.conv_general_dilated(x.astype(self.dtype), a.astype(self.dtype),
                                           window_strides=tuple(self.strides),
                                           padding=pad, dimension_numbers=dn)
            up = lax.conv_general_dilated(low, b.astype(self.dtype),
                                          window_strides=(1, 1), padding="VALID",
                                          dimension_numbers=dn)
            y = y + up * scaling
        return y


class AdaptConfig:
    """Static view over cfg.adapt (reference configs/adapt/*.yaml)."""

    def __init__(self, cfg_adapt: Optional[dict]):
        cfg_adapt = dict(cfg_adapt or {})
        self.method = str(cfg_adapt.get("method", "none") or "none")
        self.adapt_kwargs = dict(cfg_adapt.get("adapt_kwargs", {}) or {})
        self.linear_kwargs = dict(cfg_adapt.get("linear_kwargs", {}) or {})
        self.conv_kwargs = dict(cfg_adapt.get("conv_kwargs", {}) or {})

    @property
    def lora(self) -> bool:
        return "lora" in self.method

    @property
    def use_adapter(self) -> bool:
        return "adapter" in self.method and self.adapt_kwargs.get("type") == "adapter"

    def position(self) -> str:
        return "".join(map(str, self.adapt_kwargs.get("position", []) or []))

    @property
    def mlp_adapter(self) -> bool:
        return self.use_adapter and "MlpAdapter" in self.position()

    @property
    def spatial_adapter(self) -> bool:
        return self.use_adapter and "SpatialAdapter" in self.position()

    def lora_linear_args(self) -> dict:
        if not self.lora:
            return {"lora_r": 0}
        return {"lora_r": int(self.linear_kwargs.get("r", 0)),
                "lora_alpha": float(self.linear_kwargs.get("lora_alpha", 1.0))}

    def lora_conv_args(self) -> dict:
        if not self.lora:
            return {"lora_r": 0}
        return {"lora_r": int(self.conv_kwargs.get("r", 0)),
                "lora_alpha": float(self.conv_kwargs.get("lora_alpha", 1.0))}

    def kernels_support(self) -> bool:
        """True when this config's per-block structure is expressible in the
        fused Pallas kernels: no LoRA (rewrites qkv/proj/merge denses), and
        any bottleneck adapters use a CONSTANT scalar, gelu, and no second
        (new_adapter) bottleneck. Gates both the fused train path
        (train/fused_forward) and fused adapter eval (serving/htsat)."""
        if self.lora:
            return False
        if not (self.mlp_adapter or self.spatial_adapter):
            return True
        kw = self.adapt_kwargs
        return (isinstance(kw.get("adapter_scalar", "learnable_scalar"),
                           (int, float))
                and str(kw.get("act_layer", "gelu")).lower() == "gelu"
                and not kw.get("new_adapter"))

    def adapter_args(self) -> dict:
        kw = self.adapt_kwargs
        return {"mlp_ratio": float(kw.get("mlp_ratio", 0.25)),
                "adapter_scalar": kw.get("adapter_scalar", "learnable_scalar"),
                "act_layer": kw.get("act_layer", "gelu")}

    @property
    def new_adapter(self) -> dict:
        """Optional SECOND parallel Mlp bottleneck (reference
        model_utilities.py:153-157 ``adapt_kwargs.new_adapter`` ->
        ``adapter_ds``); unused by every shipped config."""
        return dict(self.adapt_kwargs.get("new_adapter", {}) or {})

    def ds_adapter_args(self) -> dict:
        kw = self.new_adapter
        # reference Adapter defaults (model_utilities_adapt.py:8-9):
        # mlp_ratio 0.25, gelu, CONSTANT scalar 1
        return {"mlp_ratio": float(kw.get("mlp_ratio", 0.25)),
                "adapter_scalar": kw.get("adapter_scalar", 1),
                "act_layer": kw.get("act_layer", "gelu")}


NO_ADAPT = AdaptConfig(None)
