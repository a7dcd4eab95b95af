"""Build inference policies from a TrainConfig + checkpoint directory.

Capability parity with lihzha/lap ``policies/policy_config_adapter.py``:
restore params (bf16), load norm stats from the checkpoint's assets dir,
assemble the input stack [repack -> InjectDefaultPrompt -> data transforms
-> Normalize -> model transforms] and the strategy-dependent output stack.
"""

from __future__ import annotations

import logging
from pathlib import Path

import jax.numpy as jnp

from lap_tpu.policies.model_transforms import Normalize, Unnormalize
from lap_tpu.policies.policy import ARPolicy, Policy

logger = logging.getLogger(__name__)


def _load_norm_stats(checkpoint_dir: Path, asset_id: str | None):
    from lap_tpu.training.checkpoints import load_norm_stats

    assets_dir = checkpoint_dir / "assets"
    if not assets_dir.exists():
        logger.warning("no assets dir at %s; skipping normalization", assets_dir)
        return None
    if asset_id:
        stats = load_norm_stats(assets_dir, asset_id)
        if stats is not None:
            return stats
    # Fall back to the first asset dir with norm stats.
    for sub in sorted(assets_dir.iterdir()):
        if (sub / "norm_stats.json").exists():
            return load_norm_stats(assets_dir, sub.name)
    return None


def _build_transform_stacks(train_config, norm_stats, *, default_prompt=None, ar: bool):
    data_cfg = train_config.data
    model_cfg = train_config.model
    data_group = data_cfg.data_transforms(model_cfg)
    model_group = data_cfg.model_transforms(model_cfg, include_outputs=ar)
    norm_type = data_cfg.action_proprio_normalization_type

    from lap_tpu.policies.model_transforms import InjectDefaultPrompt

    input_stack = [
        InjectDefaultPrompt(default_prompt),
        *data_group.inputs,
        Normalize(norm_stats, normalization_type=norm_type),
        *model_group.inputs,
    ]
    if ar:
        # Detokenize -> parse reasoning to deltas (raw, physical units).
        output_stack = [*model_group.outputs, *data_group.outputs]
    else:
        output_stack = [Unnormalize(norm_stats, normalization_type=norm_type)]
    return input_stack, output_stack


def _require_real_tokenizer(stacks, *, allow_test_vocab: bool):
    """Serving a trained checkpoint through the built-in test vocabulary
    produces garbage reasoning text (the vocab is NOT byte-compatible with
    released checkpoints). Hard-fail unless the caller explicitly opts in
    (tests / benchmarks on fabricated checkpoints)."""
    if allow_test_vocab:
        return
    for stack in stacks:
        for transform in stack:
            tok = getattr(transform, "tokenizer", None)
            proc = getattr(tok, "_tokenizer", None)
            if getattr(proc, "is_test_vocab", False):
                raise RuntimeError(
                    "Refusing to serve a trained checkpoint with the built-in "
                    "TEST tokenizer vocabulary: reasoning/token outputs would "
                    "be garbage. Point LAP_TPU_TOKENIZER_MODEL (or "
                    "LAP_TPU_GEMMA3_TOKENIZER_MODEL) at the real tokenizer "
                    ".model file, or pass allow_test_vocab=True "
                    "(--allow_test_vocab on the CLI) for test checkpoints."
                )


def _restore(
    train_config,
    checkpoint_dir: Path,
    *,
    quantize: str | None = None,
    tp: int = 1,
):
    from lap_tpu.training.checkpoints import restore_params, restore_params_sharded

    if tp > 1 and quantize is not None:
        raise ValueError(
            "quantized serving (int8/int4) is single-chip (the Pallas "
            "dequant-matmuls are not GSPMD-partitioned); use tp=1 or "
            "quantize=None"
        )
    # Inference always runs the model in bf16 on TPU (reference
    # policy_config_adapter loads params via model.load in the model dtype).
    dtype = jnp.bfloat16 if train_config.model.dtype == "bfloat16" else jnp.float32
    # Inference disables the training-only stop-gradient (serve_policy.py:77)
    # and fully unrolls the layer scan: straight-line decode lets XLA overlap
    # weight prefetch across layers/steps (LAP-3B: 28.9 -> 32.3 Hz on v5e).
    import dataclasses

    overrides = dict(
        stop_action_to_vlm_grad=False,
        scan_unroll=train_config.model.backbone_depth,
    )
    if quantize is not None:
        # Weight-only quantized decode: per-layer blocks (Pallas kernels
        # need real per-layer weight arrays, not scan slices) + a "quant"
        # variable collection populated from the restored bf16 params.
        # Opt-in: ~0.4% per-matmul weight rounding at int8 (per-channel
        # scales), ~2% at int4 (group-wise scales, 256 rows/group); prefill
        # stays exact bf16 either way.
        overrides.update(quant=quantize, scan_layers=False, scan_unroll=1)
    model_cfg = dataclasses.replace(train_config.model, **overrides)
    model = model_cfg.create_module()
    if tp > 1:
        # Tensor-parallel serving: models larger than one chip's HBM
        # (gemma3_12b/27b, or 4B at bf16+activations) shard attention heads
        # and MLP hidden dims over a tp-axis mesh (DEFAULT_TP_RULES); GSPMD
        # inserts the ICI collectives. The checkpoint restores DIRECTLY onto
        # the device shardings -- the full model never stages in host RAM.
        import jax

        from lap_tpu.parallel.mesh import make_mesh
        from lap_tpu.parallel.sharding import fsdp_sharding

        mesh = make_mesh(fsdp_devices=1, tp_devices=tp)
        shapes = jax.eval_shape(
            lambda k: model.init(k, k, method=model.init_params_fn),
            jax.random.PRNGKey(0),
        )["params"]
        sharding_tree = fsdp_sharding(shapes, mesh)
        params = restore_params_sharded(checkpoint_dir / "params", sharding_tree)
        # Donated cast: an f32 checkpoint served as bf16 must not hold both
        # copies — the tp feature's whole point is models that barely fit.
        params = jax.jit(
            lambda p: jax.tree.map(lambda x: x.astype(dtype), p),
            donate_argnums=0,
        )(params)
        return model, {"params": params}
    params = restore_params(checkpoint_dir / "params", dtype=dtype)
    variables = {"params": params} if "params" not in params else params
    if quantize is not None:
        import jax

        from lap_tpu.models import gemma as _gemma

        p = dict(variables["params"])
        p["llm"] = _gemma.unstack_layer_params(
            dict(p["llm"]), model_cfg.backbone_depth
        )
        # NOTE on host memory: the per-layer leaves are numpy VIEWS into the
        # stacked arrays, so the stacked buffers stay alive (on host) either
        # way; only the device ever materializes per-layer copies, during
        # the jit below. No extra host copy is made here on purpose.
        del params
        variables = {"params": p}
        _, qvars = jax.jit(
            lambda v, r: model.apply(
                v, r, method=model.init_params_fn, mutable=["quant"]
            )
        )(variables, jax.random.PRNGKey(0))
        variables = {"params": p, "quant": qvars["quant"]}
    return model, variables


def _resolve_checkpoint_dir(checkpoint_dir) -> Path:
    """gs://... checkpoint dirs mirror into the local asset cache (commit
    markers + scratch promotion + same-bucket rules in utils/download.py,
    matching reference shared/download.py); local paths pass through."""
    from lap_tpu.utils.download import maybe_download

    resolved = maybe_download(str(checkpoint_dir))
    if not isinstance(resolved, Path):
        raise NotImplementedError(
            "policy restore through a remote (gs://) LAP_TPU_DATA_HOME cache "
            "is not supported; use a local cache dir"
        )
    return resolved


def create_trained_policy(
    train_config,
    checkpoint_dir: str | Path,
    *,
    default_prompt: str | None = None,
    num_steps: int = 10,
    allow_test_vocab: bool = False,
    quantize: str | None = None,
    tp: int = 1,
    token_bucket: int | None = None,
) -> Policy:
    checkpoint_dir = _resolve_checkpoint_dir(checkpoint_dir)
    # Stacks + tokenizer guard FIRST: they need only the config and cheap
    # norm-stats JSON, so a missing real tokenizer fails in milliseconds
    # instead of after the multi-GB parameter restore.
    norm_stats = _load_norm_stats(checkpoint_dir, train_config.data.asset_id)
    inputs, outputs = _build_transform_stacks(
        train_config, norm_stats, default_prompt=default_prompt, ar=False
    )
    _require_real_tokenizer([inputs, outputs], allow_test_vocab=allow_test_vocab)
    model, params = _restore(train_config, checkpoint_dir, quantize=quantize, tp=tp)
    return Policy(
        model,
        params,
        input_transforms=inputs,
        output_transforms=outputs,
        num_steps=num_steps,
        token_bucket=token_bucket,
        metadata={"config": train_config.name, "mode": "flow"},
    )


def create_trained_policy_ar(
    train_config,
    checkpoint_dir: str | Path,
    *,
    default_prompt: str | None = None,
    max_decoding_steps: int = 390,
    temperature: float = 0.0,
    allow_test_vocab: bool = False,
    quantize: str | None = None,
    tp: int = 1,
    token_bucket: int | None = None,
) -> ARPolicy:
    checkpoint_dir = _resolve_checkpoint_dir(checkpoint_dir)
    norm_stats = _load_norm_stats(checkpoint_dir, train_config.data.asset_id)
    inputs, outputs = _build_transform_stacks(
        train_config, norm_stats, default_prompt=default_prompt, ar=True
    )
    _require_real_tokenizer([inputs, outputs], allow_test_vocab=allow_test_vocab)
    model, params = _restore(train_config, checkpoint_dir, quantize=quantize, tp=tp)
    return ARPolicy(
        model,
        params,
        input_transforms=inputs,
        output_transforms=outputs,
        max_decoding_steps=max_decoding_steps,
        temperature=temperature,
        token_bucket=token_bucket,
        metadata={"config": train_config.name, "mode": "ar"},
    )
