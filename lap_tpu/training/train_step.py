"""The jitted training / validation step.

Capability parity with lihzha/lap ``scripts/train.py:329-450``
(TrainingStepRunner / ValidationStepRunner), built for pjit over the
(dp, fsdp, tp) mesh: fwd+bwd with rematerialized layers, optax update,
staged EMA, grad/param norms — all one fused XLA program with donated state.
"""

from __future__ import annotations

import dataclasses
from collections.abc import Callable

import jax
import jax.numpy as jnp
import optax

from lap_tpu.training.optimizer import EmaSchedule
from lap_tpu.training.state import TrainState, inference_params


@dataclasses.dataclass(frozen=True)
class StepFunctions:
    train_step: Callable
    val_step: Callable
    init_fn: Callable


def make_step_functions(
    model,
    tx: optax.GradientTransformation,
    *,
    ema_schedule: EmaSchedule | None = None,
    param_dtype=jnp.float32,
    freeze_mask=None,
) -> StepFunctions:
    """Build pure functions over (rng, state, batch); jit/pjit them outside.

    ``freeze_mask`` (bool pytree, True = frozen): PARTITIONED freezing —
    frozen params ride through the loss as non-differentiated arguments, so
    their gradient buffers are never allocated and XLA prunes their backward
    compute. A mask-based optimizer (optax.multi_transform + set_to_zero)
    keeps full-tree gradients alive: at LAP-3B that is ~13 GB of dead grads,
    the difference between a frozen-VLM fine-tune fitting one 16 GB v5e chip
    or OOMing at 31 GB. Pass a PLAIN tx (no freeze wrapper) with this;
    ``opt_state`` is laid out over the trainable subset only.
    """

    def _split(params):
        trainable = jax.tree.map(lambda p, m: None if m else p, params, freeze_mask)
        frozen = jax.tree.map(lambda p, m: p if m else None, params, freeze_mask)
        return trainable, frozen

    def _merge(trainable, frozen):
        return jax.tree.map(
            lambda a, b: a if b is None else b,
            trainable,
            frozen,
            is_leaf=lambda x: x is None,
        )

    def init_fn(rng) -> TrainState:
        init_rng, loss_rng = jax.random.split(rng)
        variables = model.init(init_rng, loss_rng, method=model.init_params_fn)
        params = jax.tree.map(
            lambda x: x.astype(param_dtype), variables["params"]
        )
        if freeze_mask is None:
            opt_state = tx.init(params)
        else:
            opt_state = tx.init(_split(params)[0])
        ema_params = None
        if ema_schedule is not None and ema_schedule.has_ema():
            # Partitioned freezing extends to EMA: frozen params never
            # change, so their EMA is themselves — buffer only the
            # trainable leaves (None elsewhere; inference_params() merges
            # the gaps back from params). At LAP-3B frozen-VLM shape this
            # drops ~11 GB of dead EMA copies.
            if freeze_mask is None:
                ema_params = params  # immutable jax arrays: aliasing is fine
            else:
                ema_params = _split(params)[0]
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=opt_state,
            ema_params=ema_params,
        )

    def loss_fn(params, rng, observation, actions, train):
        loss, metrics = model.apply(
            {"params": params},
            rng,
            observation,
            actions,
            train=train,
            method=model.compute_loss,
        )
        return loss, metrics

    def train_step(rng, state: TrainState, batch):
        observation, actions = batch
        step_rng = jax.random.fold_in(rng, state.step)
        if freeze_mask is None:
            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, step_rng, observation, actions, True
            )
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
        else:
            trainable, frozen = _split(state.params)

            def loss_part(t, f, rng_, obs_, act_):
                return loss_fn(_merge(t, f), rng_, obs_, act_, True)

            (loss, metrics), grads = jax.value_and_grad(loss_part, has_aux=True)(
                trainable, frozen, step_rng, observation, actions
            )
            updates, opt_state = tx.update(grads, state.opt_state, trainable)
            trainable = optax.apply_updates(trainable, updates)
            params = _merge(trainable, frozen)

        ema_params = state.ema_params
        if ema_params is not None:
            decay, enabled = ema_schedule.get_decay_for_step(state.step)
            # .astype(e.dtype): the f32 decay scalar would otherwise promote
            # bf16 EMA buffers to f32 (aval change -> full recompile at step
            # 2, 2x EMA memory, mixed-dtype checkpoint params).
            ema_params = jax.tree.map(
                lambda e, p: None
                if e is None
                else jnp.where(enabled, decay * e + (1 - decay) * p, p).astype(
                    e.dtype
                ),
                ema_params,
                params,
                is_leaf=lambda x: x is None,
            )

        new_state = TrainState(
            step=state.step + 1,
            params=params,
            opt_state=opt_state,
            ema_params=ema_params,
        )
        metrics = dict(metrics)
        metrics["loss"] = loss
        metrics["grad_norm"] = optax.global_norm(grads)
        metrics["param_norm"] = optax.global_norm(params)
        return new_state, metrics

    def val_step(rng, state: TrainState, batch):
        observation, actions = batch
        params = inference_params(state)
        loss, metrics = loss_fn(params, rng, observation, actions, False)
        metrics = dict(metrics)
        metrics["loss"] = loss
        return metrics

    return StepFunctions(train_step=train_step, val_step=val_step, init_fn=init_fn)
