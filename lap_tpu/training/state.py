"""Train state container (reference: lihzha/lap training/state.py:10-18)."""

from __future__ import annotations

from typing import Any

from flax import struct


@struct.dataclass
class TrainState:
    step: Any
    params: Any  # model params pytree (inner tree, no {"params": ...} wrapper)
    opt_state: Any
    ema_params: Any = None  # None when EMA disabled
