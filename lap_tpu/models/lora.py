"""Einsum / FeedForward primitives with optional LoRA adapters.

Provides the capability surface of ``openpi.models.lora`` consumed by the
reference backbones (lihzha/lap ``gemma.py:36,180-199``): an einsum layer
whose weight may be augmented with a low-rank A@B adapter, and the gated-GELU
feed-forward block. Parameter names match the PaliGemma/openpi checkpoint
layout (``w``, ``gating_einsum``, ``linear``) so released checkpoints load
without remapping; LoRA adapters are fresh parameters (``lora_a``/``lora_b``)
and never exist in released checkpoints.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class LoRAConfig:
    rank: int
    alpha: float = 1.0
    # Initialization scale of lora_a (lora_b is zeros, so adapters start as a
    # no-op).
    init_scale: float = 0.01

    @property
    def scaling_value(self) -> float:
        return self.alpha / self.rank


def _lora_einsum(eqn: str, x, a, b, scaling: float):
    """Apply a low-rank adapter for ``einsum(eqn, x, w)``.

    The weight's last two axes (in, out) are factored as
    (..., in, r) @ (..., r, out).
    """
    lhs, rhs = eqn.split("->")
    x_spec, w_spec = lhs.split(",")
    out_axis = w_spec[-1]
    a_spec = w_spec[:-1] + "r"
    mid_spec = rhs.replace(out_axis, "r")
    b_spec = w_spec[:-2] + "r" + out_axis
    mid = jnp.einsum(f"{x_spec},{a_spec}->{mid_spec}", x, a)
    return scaling * jnp.einsum(f"{mid_spec},{b_spec}->{rhs}", mid, b)


class Einsum(nn.Module):
    """y = einsum(spec, x, w) with an optional low-rank residual adapter."""

    shape: tuple[int, ...]
    init_fn: nn.initializers.Initializer
    lora_config: LoRAConfig | None = None

    @nn.compact
    def __call__(self, eqn: str, x):
        dtype = x.dtype
        w = self.param("w", self.init_fn, self.shape).astype(dtype)
        out = jnp.einsum(eqn, x, w)
        if self.lora_config is not None:
            cfg = self.lora_config
            *batch_dims, in_dim, out_dim = self.shape
            a = self.param(
                "lora_a",
                nn.initializers.normal(cfg.init_scale),
                (*batch_dims, in_dim, cfg.rank),
            ).astype(dtype)
            b = self.param(
                "lora_b",
                nn.initializers.zeros_init(),
                (*batch_dims, cfg.rank, out_dim),
            ).astype(dtype)
            out = out + _lora_einsum(eqn, x, a, b, cfg.scaling_value)
        return out


class FeedForward(nn.Module):
    """Gemma gated-GELU MLP: (gelu(x @ w0) * (x @ w1)) @ w2.

    Matches the reference numerics (lihzha/lap ``gemma.py:294-321``) and raw
    parameter names (``gating_einsum`` [2, D, F], ``linear`` [F, D]).
    """

    features: int
    hidden_dim: int
    lora_config: LoRAConfig | None = None

    @nn.compact
    def __call__(self, x):
        dtype = x.dtype
        w_gating = self.param(
            "gating_einsum",
            nn.initializers.lecun_normal(in_axis=-2, out_axis=-1, batch_axis=(0,)),
            (2, self.features, self.hidden_dim),
        ).astype(dtype)
        # One einsum with the gate/up pair as a batch dim, NOT two dots on
        # static slices: under scan-stacked layers the per-layer
        # dynamic-slice then feeds the dot directly and fuses, instead of
        # materializing a [2, D, F] weight copy every layer (measured ~7 ms
        # per LAP-3B prefill on v5e before this change).
        gates = jnp.einsum("...D,GDF->G...F", x, w_gating)
        gate_pre, up = gates[0], gates[1]
        if self.lora_config is not None:
            cfg = self.lora_config
            a = self.param(
                "gating_lora_a",
                nn.initializers.normal(cfg.init_scale),
                (2, self.features, cfg.rank),
            ).astype(dtype)
            b = self.param(
                "gating_lora_b",
                nn.initializers.zeros_init(),
                (2, cfg.rank, self.hidden_dim),
            ).astype(dtype)
            gate_pre = gate_pre + cfg.scaling_value * ((x @ a[0]) @ b[0])
            up = up + cfg.scaling_value * ((x @ a[1]) @ b[1])
        act = nn.gelu(gate_pre) * up
        w_linear = self.param(
            "linear",
            nn.initializers.lecun_normal(in_axis=-2, out_axis=-1),
            (self.hidden_dim, self.features),
        ).astype(dtype)
        out = act @ w_linear
        if self.lora_config is not None:
            cfg = self.lora_config
            a = self.param(
                "linear_lora_a",
                nn.initializers.normal(cfg.init_scale),
                (self.hidden_dim, cfg.rank),
            ).astype(dtype)
            b = self.param(
                "linear_lora_b",
                nn.initializers.zeros_init(),
                (cfg.rank, self.features),
            ).astype(dtype)
            out = out + cfg.scaling_value * ((act @ a) @ b)
        return out
