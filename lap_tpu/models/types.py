"""Observation / action containers.

Provides the capability surface of ``openpi.models.model.Observation`` plus
the CoT extensions of lihzha/lap ``model_adapter.py:39-80``: per-camera
images and validity masks, proprioceptive state, tokenized prompt with
autoregressive / loss / language-action masks, and the sample-level routing
flags (VQA / prediction / sample_mask / per-VQA-dataset id).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

IMAGE_RESOLUTION = (224, 224)

IMAGE_KEYS = (
    "base_0_rgb",
    "left_wrist_0_rgb",
)

Actions = jax.Array  # [b, action_horizon, action_dim]


@struct.dataclass
class Observation:
    """A single (batched) model input."""

    images: dict[str, Any]
    image_masks: dict[str, Any]
    state: Any
    tokenized_prompt: Any = None
    tokenized_prompt_mask: Any = None
    token_ar_mask: Any = None
    token_loss_mask: Any = None

    @classmethod
    def from_dict(cls, data: dict, *, convert_images: bool = True) -> "Observation":
        return cls(**_base_fields_from_dict(data, convert_images=convert_images))


@struct.dataclass
class CoTObservation(Observation):
    """Observation with chain-of-thought (language-action) extras."""

    tokenized_langact_mask: Any = None
    critical_token_mask: Any = None
    number_token_mask: Any = None
    direction_token_mask: Any = None
    sample_mask: Any = None
    tokenized_dataset_name: Any = None
    is_vqa_sample: Any = None
    is_prediction_sample: Any = None
    vqa_dataset_id: Any = None

    @classmethod
    def from_dict(cls, data: dict, *, convert_images: bool = True) -> "CoTObservation":
        fields = _base_fields_from_dict(data, convert_images=convert_images)
        cot_src = data.get("extras", {}).get("cot", {})

        def getk(k):
            return data.get(k, cot_src.get(k, None))

        extras = {
            k: getk(k)
            for k in (
                "tokenized_langact_mask",
                "critical_token_mask",
                "number_token_mask",
                "direction_token_mask",
                "sample_mask",
                "tokenized_dataset_name",
                "is_vqa_sample",
                "is_prediction_sample",
                "vqa_dataset_id",
            )
        }
        return cls(**fields, **extras)


def _to_float_image(img):
    """uint8 [0, 255] -> float32 [-1, 1]; float images pass through."""
    if hasattr(img, "dtype") and np.issubdtype(np.dtype(img.dtype), np.integer):
        return img.astype(jnp.float32) / 127.5 - 1.0
    return img


def _base_fields_from_dict(data: dict, *, convert_images: bool = True) -> dict:
    # convert_images=False keeps uint8 images: 4x fewer bytes over the
    # host->device link; preprocess_observation converts on device instead.
    images = {
        k: (_to_float_image(v) if convert_images else v)
        for k, v in data["image"].items()
    }
    return dict(
        images=images,
        image_masks=dict(data.get("image_mask", {})),
        state=data["state"],
        tokenized_prompt=data.get("tokenized_prompt"),
        tokenized_prompt_mask=data.get("tokenized_prompt_mask"),
        token_ar_mask=data.get("token_ar_mask"),
        token_loss_mask=data.get("token_loss_mask"),
    )


def fake_obs(
    *,
    batch_size: int = 1,
    image_keys: tuple[str, ...] = IMAGE_KEYS,
    action_dim: int = 7,
    max_token_len: int = 48,
    resolution: tuple[int, int] = IMAGE_RESOLUTION,
) -> CoTObservation:
    """A zero observation matching the model input spec (for init/compile)."""
    h, w = resolution
    return CoTObservation(
        images={k: jnp.zeros((batch_size, h, w, 3), jnp.float32) for k in image_keys},
        image_masks={k: jnp.ones((batch_size,), bool) for k in image_keys},
        state=jnp.zeros((batch_size, action_dim), jnp.float32),
        tokenized_prompt=jnp.zeros((batch_size, max_token_len), jnp.int32),
        tokenized_prompt_mask=jnp.ones((batch_size, max_token_len), bool),
        tokenized_langact_mask=jnp.zeros((batch_size, max_token_len), bool),
        token_loss_mask=jnp.zeros((batch_size, max_token_len), bool),
        sample_mask=jnp.ones((batch_size,), bool),
    )
