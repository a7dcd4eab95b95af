"""Train state container (reference: lihzha/lap training/state.py:10-18)."""

from __future__ import annotations

from typing import Any

import jax
from flax import struct


@struct.dataclass
class TrainState:
    step: Any
    params: Any  # model params pytree (inner tree, no {"params": ...} wrapper)
    opt_state: Any
    ema_params: Any = None  # None when EMA disabled


def inference_params(state: TrainState):
    """The EMA view served/saved for inference.

    Under PARTITIONED freezing the EMA tree holds only the trainable
    leaves (None where frozen — the EMA of a never-updated param is the
    param itself, so buffering it would waste a full frozen-tree copy);
    the gaps are filled from ``state.params`` here. With full EMA or EMA
    disabled this reduces to the plain reference semantics
    (checkpoints.py:529-547 ``_split_params``)."""
    if state.ema_params is None:
        return state.params
    return jax.tree.map(
        lambda e, p: p if e is None else e,
        state.ema_params,
        state.params,
        is_leaf=lambda x: x is None,
    )
