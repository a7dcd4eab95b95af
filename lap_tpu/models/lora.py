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
import math

import flax.linen as nn
import jax.numpy as jnp

from lap_tpu.ops.int4_matmul import int4_matmul, quantize_int4
from lap_tpu.ops.int8_matmul import int8_matmul, quantize_int8

# Row threshold for dispatching to the Pallas dequant-matmuls: decode
# calls (1 AR token, or batch x action_horizon flow-suffix rows) are HBM
# weight-read bound and win ~2x from int8 streaming (~2x again from int4);
# prefill calls (hundreds of rows) are MXU-bound and stay on the exact
# bf16 einsum.
QUANT_MAX_ROWS = 128
# Weights below this element count stay bf16: the kernel's fixed dispatch
# cost (~10 us) eats the bandwidth saving on small matrices (measured on
# v5e: K=1024,N=2048 REGRESSED 0.6x while K=16384,N=2048 won 2.9x). At the
# default, gemma_2b's qkv/proj/MLP/vocab matmuls quantize; the tiny
# kv_einsum and the 300m expert's attention projections do not.
QUANT_MIN_WEIGHT_ELEMS = 4 * 2**20
# int4 group size preference (rows of the contraction axis per scale).
# Largest candidate dividing K/2 wins; K with no candidate (odd / tiny)
# falls back to int8 per-channel for that weight.
INT4_GROUP_CANDIDATES = (256, 128, 64, 32)


def _int4_group(k: int) -> int | None:
    for g in INT4_GROUP_CANDIDATES:
        if k % (2 * g) == 0:
            return g
    return None


def _plan_quant_einsum(eqn: str):
    """Decompose ``einsum(eqn, x, w)`` into a 2-D ``[M,K] @ [K,N]`` matmul.

    Returns (x_batch, contract, w_out, w_perm, out_perm) where ``w_perm``
    transposes w to (contract..., out...) and ``out_perm`` transposes the
    reshaped [*x_batch, *w_out] result into the eqn's output order.
    Requires x's axes to already be laid out (batch..., contract...) — true
    for every spec the Gemma backbones use.
    """
    lhs, out_spec = eqn.split("->")
    x_spec, w_spec = lhs.split(",")
    contract = [a for a in w_spec if a in x_spec]
    w_out = [a for a in w_spec if a not in x_spec]
    x_batch = [a for a in x_spec if a not in w_spec]
    if list(x_spec) != x_batch + contract:
        raise ValueError(f"x axes not (batch..., contract...) in {eqn!r}")
    natural = x_batch + w_out
    if sorted(out_spec) != sorted(natural) or len(out_spec) != len(natural):
        raise ValueError(f"unsupported output spec in {eqn!r}")
    w_perm = tuple(w_spec.index(a) for a in contract + w_out)
    out_perm = tuple(natural.index(a) for a in out_spec)
    return x_batch, contract, w_out, w_perm, out_perm


def _quant_pair(w_raw, w_perm, n_contract: int, mode: str):
    """One-time relayout + quantization: int8 per-output-channel, or int4
    group-wise (falling back to int8 when K fits no group candidate)."""
    wt = jnp.transpose(w_raw, w_perm)
    k = math.prod(wt.shape[:n_contract])
    n = math.prod(wt.shape[n_contract:])
    if mode == "int4":
        g = _int4_group(k)
        if g is not None:
            return quantize_int4(wt.reshape(k, n), group_size=g)
    return quantize_int8(wt.reshape(k, n), axis=0)


def quant_enabled(quant: str | None, lora_config, n_weight_elems: int) -> bool:
    """Shared quantization gate: mode valid, no unmerged adapters, and the
    weight big enough that the kernel's fixed cost pays for itself."""
    if quant is None:
        return False
    if quant not in ("int8", "int4"):
        raise ValueError(f"unknown quant mode: {quant}")
    return lora_config is None and n_weight_elems >= QUANT_MIN_WEIGHT_ELEMS


def quant_vars(mdl: nn.Module, prefix: str, w_raw, w_perm, n_contract: int,
               mode: str = "int8"):
    """Declare (or read) the paired quantized-weight/scale variables for one
    weight. The variable name records the actual packing ("w_i8" per-channel
    int8, "w_i4" nibble-packed group-wise int4 — a weight whose K fits no
    int4 group candidate keeps int8 even in int4 mode).

    The pair is computed at most once per call (memoized across the two
    init lambdas — the eager populate pass would otherwise transpose and
    quantize every large matrix twice)."""
    memo: dict = {}

    def pair(i: int):
        if "p" not in memo:
            memo["p"] = _quant_pair(w_raw, w_perm, n_contract, mode)
        return memo["p"][i]

    k = math.prod(w_raw.shape[p] for p in w_perm[:n_contract])
    packed4 = mode == "int4" and _int4_group(k) is not None
    name = f"{prefix}w_i4" if packed4 else f"{prefix}w_i8"
    sname = f"{prefix}scale"
    w_q = mdl.variable("quant", name, lambda: pair(0))
    scale = mdl.variable("quant", sname, lambda: pair(1))
    return w_q.value, scale.value


def quant_matmul(x, w_q, scale, out_shape):
    """Flatten-to-2D dequant matmul + reshape; caller guarantees the row
    budget. The packing is recovered from the scale rank: int4 group scales
    are 2-D [K/G, N], int8 per-channel scales are 1-D [N]."""
    if scale.ndim == 2:
        k = 2 * w_q.shape[0]
        y2d = int4_matmul(x.reshape(-1, k), w_q, scale)
    else:
        k = w_q.shape[0]
        y2d = int8_matmul(x.reshape(-1, k), w_q, scale)
    return y2d.reshape(out_shape)


def quant_dispatch(
    mdl: nn.Module,
    prefix: str,
    w_raw,
    w_perm,
    n_contract: int,
    *,
    quant: str | None,
    lora_config,
    x,
    out_shape,
):
    """Per-weight quantized-matmul dispatch.

    Gates on THIS weight's own element count (each weight must pay for the
    kernel's fixed cost itself), declares the int8/scale variable pair when
    gated, and streams decode-shaped calls (rows <= QUANT_MAX_ROWS) through
    the Pallas kernel. Returns the kernel output, or None when the caller
    should take its exact bf16 einsum instead. Variable declaration happens
    whenever the weight gates — independent of the row budget — so the
    module's variable structure is call-shape invariant.
    """
    if not quant_enabled(quant, lora_config, w_raw.size):
        return None
    w_q, scale = quant_vars(mdl, prefix, w_raw, w_perm, n_contract, quant)
    if math.prod(x.shape[:-1]) > QUANT_MAX_ROWS:
        return None
    return quant_matmul(x, w_q, scale, out_shape)


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
    """y = einsum(spec, x, w) with an optional low-rank residual adapter.

    With ``quant="int8"``/``"int4"`` (serving-only, opt-in) a quantized copy
    of the weight lives in the "quant" variable collection; decode-shaped
    calls (few rows) stream it through the matching Pallas dequant-matmul
    while prefill keeps the exact bf16 einsum. LoRA-adapted einsums never
    quantize (adapters are unmerged, so the base-weight-only kernel would
    drop them).
    """

    shape: tuple[int, ...]
    init_fn: nn.initializers.Initializer
    lora_config: LoRAConfig | None = None
    quant: str | None = None

    @nn.compact
    def __call__(self, eqn: str, x):
        dtype = x.dtype
        w_raw = self.param("w", self.init_fn, self.shape)
        if quant_enabled(self.quant, self.lora_config, math.prod(self.shape)):
            x_batch, contract, _w_out, w_perm, out_perm = _plan_quant_einsum(eqn)
            w_q, scale = quant_vars(self, "", w_raw, w_perm, len(contract), self.quant)
            if math.prod(x.shape[: len(x_batch)]) <= QUANT_MAX_ROWS:
                out_dims = x.shape[: len(x_batch)] + tuple(
                    w_raw.shape[p] for p in w_perm[len(contract) :]
                )
                return jnp.transpose(
                    quant_matmul(x, w_q, scale, out_dims), out_perm
                )
        w = w_raw.astype(dtype)
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
    quant: str | None = None

    @nn.compact
    def __call__(self, x):
        dtype = x.dtype
        w_gating_raw = self.param(
            "gating_einsum",
            nn.initializers.lecun_normal(in_axis=-2, out_axis=-1, batch_axis=(0,)),
            (2, self.features, self.hidden_dim),
        )
        w_gating = w_gating_raw.astype(dtype)
        # [2, D, F] -> [D, 2F] so both projections stream in one kernel.
        gates_q = quant_dispatch(
            self, "gating_", w_gating_raw, (1, 0, 2), 1,
            quant=self.quant, lora_config=self.lora_config, x=x,
            out_shape=(*x.shape[:-1], 2, self.hidden_dim),
        )
        if gates_q is not None:
            gate_pre, up = gates_q[..., 0, :], gates_q[..., 1, :]
        else:
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
        w_linear_raw = self.param(
            "linear",
            nn.initializers.lecun_normal(in_axis=-2, out_axis=-1),
            (self.hidden_dim, self.features),
        )
        w_linear = w_linear_raw.astype(dtype)
        out = quant_dispatch(
            self, "linear_", w_linear_raw, (0, 1), 1,
            quant=self.quant, lora_config=self.lora_config, x=act,
            out_shape=(*x.shape[:-1], self.features),
        )
        if out is None:
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
