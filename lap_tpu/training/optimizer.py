"""Optimizers and LR / EMA schedules.

Capability parity with ``openpi.training.optimizer`` (consumed by lihzha/lap
``train.py:21,209``, ``config.py:13,517``) plus LAP's staged EMA schedules
(``config.py:372-504``): cosine-decay-with-warmup and rsqrt schedules, AdamW
with global-norm clipping, parameter freezing via optax.multi_transform, and
a jit-compatible EMA decay schedule.
"""

from __future__ import annotations

import dataclasses
from typing import Literal

import jax.numpy as jnp
import optax


@dataclasses.dataclass(frozen=True)
class CosineDecaySchedule:
    warmup_steps: int = 1_000
    peak_lr: float = 2.5e-5
    decay_steps: int = 30_000
    decay_lr: float = 2.5e-6

    def create(self) -> optax.Schedule:
        return optax.warmup_cosine_decay_schedule(
            init_value=self.peak_lr / (self.warmup_steps + 1),
            peak_value=self.peak_lr,
            warmup_steps=self.warmup_steps,
            decay_steps=self.decay_steps,
            end_value=self.decay_lr,
        )


@dataclasses.dataclass(frozen=True)
class RsqrtDecaySchedule:
    warmup_steps: int = 1_000
    peak_lr: float = 5e-5
    timescale: float = 10_000

    def create(self) -> optax.Schedule:
        def schedule(step):
            warm = self.peak_lr * (step + 1) / (self.warmup_steps + 1)
            decay = self.peak_lr * jnp.sqrt(
                (self.warmup_steps + self.timescale)
                / (jnp.maximum(step, self.warmup_steps) + self.timescale)
            )
            return jnp.where(step < self.warmup_steps, warm, decay)

        return schedule


@dataclasses.dataclass(frozen=True)
class AdamW:
    b1: float = 0.9
    b2: float = 0.95
    eps: float = 1e-8
    weight_decay: float = 1e-10
    clip_gradient_norm: float = 1.0

    def create(self, lr: optax.Schedule, weight_decay_mask=None) -> optax.GradientTransformation:
        tx = optax.adamw(
            lr,
            b1=self.b1,
            b2=self.b2,
            eps=self.eps,
            weight_decay=self.weight_decay,
            mask=weight_decay_mask,
        )
        return optax.chain(optax.clip_by_global_norm(self.clip_gradient_norm), tx)


@dataclasses.dataclass(frozen=True)
class SGDConfig:
    lr: float | None = None
    momentum: float = 0.9
    nesterov: bool = False

    def create(self, lr: optax.Schedule, weight_decay_mask=None):
        del weight_decay_mask
        return optax.sgd(lr, momentum=self.momentum, nesterov=self.nesterov)


def create_optimizer(
    optimizer,
    lr_schedule,
    *,
    weight_decay_mask=None,
    freeze_mask=None,
) -> optax.GradientTransformation:
    """Build the gradient transformation; frozen params get zero updates.

    ``freeze_mask`` is a pytree of bools (True = frozen), matching the params
    tree, typically built from a path predicate (see lap_model.get_freeze_filter).
    """
    tx = optimizer.create(lr_schedule.create(), weight_decay_mask=weight_decay_mask)
    if freeze_mask is not None:
        import jax

        labels = jax.tree.map(lambda frozen: "frozen" if frozen else "trainable", freeze_mask)
        tx = optax.multi_transform(
            {"trainable": tx, "frozen": optax.set_to_zero()}, labels
        )
    return tx


def freeze_mask_from_filter(params, path_predicate) -> dict:
    """Build a bool pytree marking frozen params from a path->bool predicate."""
    import jax

    def mark(path, _leaf):
        path_str = "/".join(str(getattr(k, "key", k)) for k in path)
        return bool(path_predicate(path_str))

    return jax.tree_util.tree_map_with_path(mark, params)


def freeze_mask_for_model(model, path_predicate) -> dict:
    """Freeze mask for a model's param tree (shapes only; no weights built)."""
    import jax

    shapes = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0), jax.random.PRNGKey(0), method=model.init_params_fn
        )
    )["params"]
    return freeze_mask_from_filter(shapes, path_predicate)


# ---------------------------------------------------------------------------
# EMA schedules (lihzha/lap config.py:372-504 semantics)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class EmaStage:
    start_step: int
    end_step: int | None = None
    decay: float | None = None  # None disables EMA updates in this range

    def validate(self):
        if self.start_step < 0:
            raise ValueError("start_step must be >= 0")
        if self.end_step is not None and self.end_step <= self.start_step:
            raise ValueError("end_step must be > start_step")
        if self.decay is not None and not 0.0 < self.decay < 1.0:
            raise ValueError("decay must be in (0, 1)")


@dataclasses.dataclass(frozen=True)
class EmaSchedule:
    stages: tuple[EmaStage, ...]

    def __post_init__(self):
        if not self.stages:
            raise ValueError("EmaSchedule needs at least one stage")
        for s in self.stages:
            s.validate()
        for cur, nxt in zip(self.stages, self.stages[1:]):
            if cur.end_step is None:
                raise ValueError("only the last stage may have end_step=None")
            if nxt.start_step < cur.end_step:
                raise ValueError("EMA stages overlap")

    def get_decay_for_step(self, step):
        """jit-compatible: returns (decay, enabled) for a traced step."""
        decay = jnp.asarray(0.0, dtype=jnp.float32)
        enabled = jnp.asarray(False)
        for stage in self.stages:
            in_range = step >= stage.start_step
            if stage.end_step is not None:
                in_range = in_range & (step < stage.end_step)
            decay = jnp.where(in_range, 0.0 if stage.decay is None else stage.decay, decay)
            enabled = jnp.where(in_range, stage.decay is not None, enabled)
        return decay, enabled

    def has_ema(self) -> bool:
        return any(s.decay is not None for s in self.stages)

    def default_decay(self) -> float | None:
        for s in self.stages:
            if s.decay is not None:
                return s.decay
        return None


@dataclasses.dataclass(frozen=True)
class EmaScheduleChoice:
    """CLI-friendly wrapper: disabled / constant / delayed / cosine_delayed."""

    kind: Literal["disabled", "constant", "delayed", "cosine_delayed"] = "delayed"
    start_step: int = 10_000

    def build(self, *, decay: float | None) -> EmaSchedule | None:
        if self.kind == "disabled" or decay is None:
            return None
        if self.kind == "constant" or (self.kind == "delayed" and self.start_step <= 0):
            return EmaSchedule(stages=(EmaStage(0, None, decay),))
        if self.kind == "delayed":
            return EmaSchedule(
                stages=(
                    EmaStage(0, self.start_step, None),
                    EmaStage(self.start_step, None, decay),
                )
            )
        if self.kind == "cosine_delayed":
            # Reference returns None here too (config.py:497-498).
            return None
        raise ValueError(f"Unsupported EMA schedule kind: {self.kind}")
