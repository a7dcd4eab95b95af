"""Inference policies: transform pipeline around the jitted model.

Capability parity with ``openpi.policies.policy.Policy`` as consumed by
lihzha/lap (``policy_config_adapter.py``, ``policy_adapter.py:13-61``):
input transforms (host numpy) -> jit sample_actions / sample_tokens ->
output transforms, with per-request timing and an optional recorder.
"""

from __future__ import annotations

import logging
import pathlib
import threading
import time
from collections.abc import Sequence

import jax
import numpy as np

from lap_tpu.models.types import CoTObservation
from lap_tpu.policies.model_transforms import compose

logger = logging.getLogger(__name__)


# Fields whose trailing axis is the (end-padded) token axis — the only ones
# prompt-length bucketing may slice.
_TOKEN_AXIS_KEYS = (
    "tokenized_prompt",
    "tokenized_prompt_mask",
    "token_ar_mask",
    "token_loss_mask",
    "tokenized_langact_mask",
    "critical_token_mask",
    "number_token_mask",
    "direction_token_mask",
)


def _trim_token_pad(batch: dict, multiple: int) -> dict:
    """Prompt-length bucketing: slice trailing all-pad token positions down
    to the next multiple-of-``multiple`` bucket.

    The tokenizer end-pads to ``max_token_len`` (180 / 800 for Gemma3) and
    the prefill computes every padded position; robot prompts are typically
    far shorter, so trimming cuts prefill work ~T_trim/T. Valid tokens are
    contiguous from 0 (tokenize() appends pads last), padded positions carry
    exactly zero attention weight, and each bucket is one cached XLA
    executable (a deployed robot's prompt length is fixed -> one compile)."""
    mask = batch.get("tokenized_prompt_mask")
    if mask is None:
        return batch
    mask = np.asarray(mask)
    t = mask.shape[-1]
    n = int(mask.sum(axis=-1).max()) if mask.size else t
    bucket = min(t, max(multiple, -(-n // multiple) * multiple))
    if bucket >= t:
        return batch
    out = dict(batch)
    for k in _TOKEN_AXIS_KEYS:
        v = out.get(k)
        if v is not None and getattr(v, "shape", ()) and v.shape[-1] == t:
            out[k] = v[..., :bucket]
    # Fail loudly if a token-axis field exists that the whitelist above does
    # not cover: a half-trimmed batch would shape-mismatch (or silently
    # mis-mask) inside embed_prefix. tokenized_dataset_name is fixed-width
    # 100, not token-axis.
    leftover = [
        k
        for k, v in out.items()
        if k not in _TOKEN_AXIS_KEYS
        and k != "tokenized_dataset_name"
        and getattr(v, "ndim", 0) >= 1
        and v.shape[-1] == t
    ]
    if leftover:
        raise ValueError(
            f"token_bucket: fields with token-length last axis not covered "
            f"by _TOKEN_AXIS_KEYS: {leftover}"
        )
    return out


def _stack_batch(inputs_list: list[dict]) -> dict:
    """Stack K transformed-input dicts into one batch-K dict.

    All requests flow through the same transform stack, which pads tokens to
    ``max_token_len`` and resizes images to a fixed resolution, so every
    leaf has identical shape across requests."""
    return jax.tree.map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]), *inputs_list
    )


class BasePolicy:
    def __init__(self, *, metadata: dict | None = None):
        self._metadata = metadata or {}
        self._step_lock = threading.Lock()
        self._step = 0

    def _next_step(self) -> int:
        """Unique per-request counter: concurrent clients (the websocket
        server runs infer in a thread pool) must not reuse a sampling key."""
        with self._step_lock:
            self._step += 1
            return self._step

    @property
    def metadata(self) -> dict:
        return self._metadata

    def infer(self, obs: dict) -> dict:  # pragma: no cover - interface
        raise NotImplementedError


class _ModelPolicy(BasePolicy):
    """Shared serving plumbing: host transform pipeline around one jitted
    sample fn. Subclasses set ``self._sample`` (jit of sample_actions /
    sample_tokens) and define ``_row_outputs`` (per-row result fields)."""

    def __init__(
        self,
        model,
        params,
        *,
        input_transforms: Sequence = (),
        output_transforms: Sequence = (),
        rng: jax.Array | None = None,
        token_bucket: int | None = None,
        metadata: dict | None = None,
    ):
        super().__init__(metadata=metadata)
        self._model = model
        self._params = params
        self._input = compose(input_transforms)
        self._output = compose(output_transforms)
        self._token_bucket = token_bucket
        self._rng = rng if rng is not None else jax.random.PRNGKey(0)

    def infer(self, obs: dict) -> dict:
        t_start = time.monotonic()
        result = self._infer_prepared([self._prepare(obs)])[0]
        result["policy_timing"] = {
            "infer_ms": (time.monotonic() - t_start) * 1000.0
        }
        return result

    def _prepare(self, obs: dict) -> dict:
        """Host-side input transforms for one request (thread-safe)."""
        return self._input(dict(obs))

    def _row_outputs(self, sampled: np.ndarray, i: int) -> dict:
        raise NotImplementedError

    def _infer_prepared(
        self, inputs_list: list[dict], n_results: int | None = None
    ) -> list[dict]:
        """One batched device call over K prepared requests.

        All rows share one sampling key fold; each row draws its own noise
        slice from the batched shape, so requests in a batch stay
        independently sampled. ``n_results`` limits the (host-side) per-row
        output transforms to the first N rows — the batcher's bucket-padding
        rows never pay the transform cost."""
        batch = _stack_batch(inputs_list)
        if self._token_bucket:
            batch = _trim_token_pad(batch, self._token_bucket)
        observation = CoTObservation.from_dict(batch)
        sampled = np.asarray(
            self._sample(self._params, self._rng, self._next_step(), observation)
        )
        state = np.asarray(batch["state"])
        results = []
        for i, inputs in enumerate(inputs_list[:n_results]):
            outputs = {"state": state[i], **self._row_outputs(sampled, i)}
            if "raw_state" in inputs:
                outputs["raw_state"] = np.asarray(inputs["raw_state"])
            results.append(self._output(outputs))
        return results


class Policy(_ModelPolicy):
    """Flow-matching action-chunk policy."""

    def __init__(self, model, params, *, num_steps: int = 10, **kw):
        super().__init__(model, params, **kw)
        # The per-request key is derived INSIDE jit (fold_in on a host int):
        # a host-side jax.random.split would add a device round-trip per
        # request, which dominates serving latency on remote-attached chips.
        self._sample = jax.jit(
            lambda p, r, step, o: model.apply(
                p, jax.random.fold_in(r, step), o, num_steps=num_steps,
                method=model.sample_actions,
            )
        )

    def _row_outputs(self, sampled, i):
        return {"actions": sampled[i]}


class ARPolicy(_ModelPolicy):
    """Autoregressive language-action policy (reference policy_adapter.py)."""

    def __init__(
        self,
        model,
        params,
        *,
        max_decoding_steps: int = 390,
        temperature: float = 0.0,
        **kw,
    ):
        super().__init__(model, params, **kw)
        # Key derivation happens inside jit (see Policy): no host-side
        # device round-trip per request.
        self._sample = jax.jit(
            lambda p, r, step, o: model.apply(
                p,
                jax.random.fold_in(r, step),
                o,
                max_decoding_steps=max_decoding_steps,
                temperature=temperature,
                method=model.sample_tokens,
            )
        )

    def _row_outputs(self, sampled, i):
        # Detokenize expects the [1, T] batch layout per request.
        return {"tokens": sampled[i : i + 1]}


def _escape_record_key(k: str) -> str:
    """'/' is the flattener's path separator, but it is also a legal request
    key character (openpi-style flat keys like 'observation/state'); escape
    it so such keys round-trip as themselves instead of as nesting."""
    return k.replace("%", "%25").replace("/", "%2F")


def _unescape_record_key(k: str) -> str:
    return k.replace("%2F", "/").replace("%25", "%")


def _flatten_record(prefix: str, tree: dict, out: dict) -> None:
    """Flatten a (possibly nested) request/response dict into npz-storable
    ``prefix/key/...`` entries — nested observation dicts included, so a
    recorded request can be replayed byte-identically
    (scripts/compare_served_outputs.py)."""
    for k, v in tree.items():
        key = f"{prefix}/{_escape_record_key(str(k))}"
        if isinstance(v, dict):
            _flatten_record(key, v, out)
        elif isinstance(v, (np.ndarray, np.number, int, float, str, bool)):
            out[key] = np.asarray(v)


def unflatten_record(flat: dict, prefix: str) -> dict:
    """Inverse of the recorder's flattening for one ``prefix`` subtree."""
    out: dict = {}
    for key, v in flat.items():
        if not key.startswith(prefix + "/"):
            continue
        node = out
        parts = [
            _unescape_record_key(p) for p in key[len(prefix) + 1 :].split("/")
        ]
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return out


class PolicyRecorder(BasePolicy):
    """Record every request/response pair to disk (openpi PolicyRecorder)."""

    def __init__(self, policy: BasePolicy, record_dir: str):
        super().__init__(metadata=policy.metadata)
        self._policy = policy
        self._record_dir = pathlib.Path(record_dir)
        self._record_dir.mkdir(parents=True, exist_ok=True)
        self._count = 0
        self._count_lock = threading.Lock()

    def infer(self, obs: dict) -> dict:
        result = self._policy.infer(obs)
        # Concurrent clients (threaded server / batched serving) must not
        # reuse a record slot.
        with self._count_lock:
            idx = self._count
            self._count += 1
        path = self._record_dir / f"step_{idx:06d}.npz"
        flat = {}
        for prefix, tree in (("obs", obs), ("out", result)):
            _flatten_record(prefix, tree, flat)
        np.savez(path, **flat)
        return result
