"""On-device training metrics.

Mirrors lihzha/lap ``src/lap/models/model_utils/metrics.py``: token accuracy
(overall / critical / number / direction), masked per-sample losses, and
per-VQA-dataset breakdowns.
"""

from __future__ import annotations

import jax.numpy as jnp


def compute_token_accuracy_metrics(
    predictions,
    labels,
    per_token_loss,
    token_mask,
    critical_mask=None,
    number_mask=None,
    direction_mask=None,
) -> dict:
    metrics = {}
    correct = (predictions == labels).astype(jnp.float32)
    metrics["token_accuracy"] = (correct * token_mask).sum() / jnp.maximum(
        token_mask.sum(), 1.0
    )
    metrics["per_token_loss"] = per_token_loss
    metrics["labels"] = labels

    for name, mask in (
        ("critical", critical_mask),
        ("number", number_mask),
        ("direction", direction_mask),
    ):
        if mask is None:
            continue
        hit = correct * mask
        metrics[f"{name}_token_accuracy"] = hit.sum() / jnp.maximum(mask.sum(), 1.0)
        metrics[f"per_sample_{name}_correct"] = hit.sum(axis=-1)
        metrics[f"per_sample_{name}_total"] = mask.sum(axis=-1)
    return metrics


def compute_sample_specific_metrics(per_sample_loss, sample_mask, prefix: str) -> dict:
    num = jnp.maximum(jnp.sum(sample_mask), 1.0)
    return {f"{prefix}loss": jnp.sum(per_sample_loss * sample_mask) / num}


def compute_per_vqa_dataset_metrics(
    per_sample_loss, vqa_dataset_ids, vqa_mask, id_to_name: dict[int, str]
) -> dict:
    metrics = {}
    for dataset_id, dataset_name in id_to_name.items():
        mask = jnp.logical_and(vqa_dataset_ids == dataset_id, vqa_mask).astype(
            jnp.float32
        )
        num = jnp.sum(mask)
        metrics[f"vqa_{dataset_name}_loss"] = jnp.sum(per_sample_loss * mask) / jnp.maximum(num, 1.0)
        metrics[f"vqa_{dataset_name}_num_samples"] = num
    return metrics
