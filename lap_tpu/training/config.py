"""Training configuration: data configs, transform factories, named configs.

Capability parity with lihzha/lap ``training/config.py``: a frozen dataclass
tree resolved by a name-registry CLI with dotted-path overrides, the
DataConfig (30+ knobs), the ModelTransformFactory that assembles tokenizer +
model transforms per model type, and all named configs (lap, lap_libero,
pi0/pi05/vla0 replicas, gemma3 sizes, cotrain, fast).
"""

from __future__ import annotations

import dataclasses
import difflib
import pathlib
from typing import Literal

from lap_tpu.data.helpers import ActionEncoding, NormalizationType, StateEncoding
from lap_tpu.models.lap_model import LAPConfig
from lap_tpu.policies.input_transforms import CoTInputs
from lap_tpu.policies.model_transforms import (
    DetokenizeReasoning,
    Group,
    InjectDefaultPrompt,
    PadStates,
    TokenizePromptAndReasoning,
)
from lap_tpu.policies.output_transforms import CoTOutputs
from lap_tpu.policies.question_types import QuestionConfig
from lap_tpu.training import optimizer as _optimizer
from lap_tpu.training import weight_loaders
from lap_tpu.utils import cli as _cli


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Data pipeline configuration (reference config.py:85-149)."""

    repo_id: str | None = "oxe"
    asset_id: str | None = "oxe"
    shuffle_buffer_size: int = 1_000_000
    max_samples: int | None = None
    val_max_samples: int | None = None
    val_fraction: float | None = 0.025
    use_wrist_image: bool = True
    wrist_image_dropout_prob: float = 0.1
    state_encoding: StateEncoding = StateEncoding.POS_EULER
    action_encoding: ActionEncoding = ActionEncoding.EEF_POS
    action_proprio_normalization_type: NormalizationType = NormalizationType.BOUNDS_Q99
    resize_resolution: tuple[int, int] = (224, 224)
    force_recompute_stats: bool = False
    # Cap on episodes per dataset for the norm-stats pass; None = full pass
    # (the reference default). Set small for quick debug runs.
    norm_stats_max_episodes: int | None = None
    # Robot-frame grounding QA (reference vqa/bbox/): directory holding
    # per-dataset subdirs of JSONL bbox annotations; frames with annotations
    # become bbox/direction QA samples with probability grounding_prob.
    bbox_annotations_dir: str | None = None
    grounding_prob: float = 0.3
    want_full_determinism: bool = False
    data_mix: str | None = "oxe_magic_soup"
    balance_weights: bool = True
    rlds_data_dir: str = "./data"

    aggressive_aug: bool = False
    aug_wrist_image: bool = True
    random_base_prob: float = 0.0
    random_mask_prob: float = 0.2
    not_rotate_wrist_prob: float = 0.0
    use_rough_scale: bool = False

    language_action_format_name: str = "verbose_eef_with_rotation"
    transform_strategy: Literal["standard", "vla0"] = "standard"
    horizon_seconds: tuple[float, ...] = (1.0,)

    max_prediction_horizon: int = 30
    pred_prob: float = 0.3
    primary_pred_prob: float = 0.8

    enable_diverse_questions: bool = True
    question_type_weights: dict | None = None
    delta_motion_format_weights: dict | None = None
    use_diverse_prompts: bool = True

    direction_prob: float = 0.0
    droid_dataset_name: Literal["droid", "droid_100"] = "droid"
    gemma3_tokenizer_path: str | None = None

    # Injected default prompt at inference when the request has none.
    default_prompt: str | None = None

    def data_transforms(self, model_config: LAPConfig) -> Group:
        """Policy-side transforms (reference RLDSDataConfig:321-359)."""
        question_config = None
        if self.enable_diverse_questions:
            question_config = QuestionConfig(
                type_weights=self.question_type_weights,
                delta_motion_format_weights=self.delta_motion_format_weights,
                use_diverse_prompts=self.use_diverse_prompts,
            )
        return Group(
            inputs=(
                CoTInputs(
                    action_dim=model_config.action_dim,
                    model_type=model_config.model_type,
                    wrist_image_dropout_prob=self.wrist_image_dropout_prob,
                    action_encoding=self.action_encoding,
                    language_action_format=self.language_action_format_name,
                    random_mask_prob=self.random_mask_prob,
                    random_base_prob=self.random_base_prob,
                    use_rough_scale=self.use_rough_scale,
                    transform_strategy=self.transform_strategy,
                    enable_langact_training=model_config.enable_langact_training,
                    enable_diverse_questions=self.enable_diverse_questions,
                    question_config=question_config,
                ),
            ),
            outputs=(
                CoTOutputs(
                    language_action_format=self.language_action_format_name,
                    transform_strategy=self.transform_strategy,
                ),
            ),
        )

    def model_transforms(self, model_config: LAPConfig, *, include_outputs: bool = True) -> Group:
        return ModelTransformFactory(
            prompt_format=model_config.prompt_format,
            prediction_format=model_config.prediction_format,
            include_outputs=include_outputs,
            gemma3_tokenizer_path=self.gemma3_tokenizer_path,
            default_prompt=self.default_prompt,
        )(model_config)


@dataclasses.dataclass(frozen=True)
class ModelTransformFactory:
    """Builds tokenizer + model transform Group per model type
    (reference config.py:151-255)."""

    prompt_format: str = "lap"
    prediction_format: str = "default"
    include_outputs: bool = True
    fast_tokenizer_path: str = "physical-intelligence/fast"
    gemma3_tokenizer_path: str | None = None
    default_prompt: str | None = None

    def _create_tokenizer(self, model_config: LAPConfig, reasoning_mask_prob: float):
        from lap_tpu.models.tokenizer import Gemma3Tokenizer, PaligemmaTokenizer

        kwargs = dict(
            max_len=model_config.max_token_len,
            prompt_format=self.prompt_format,
            prediction_format=self.prediction_format,
            reasoning_mask_prob=reasoning_mask_prob,
        )
        if "gemma3" in model_config.paligemma_variant:
            import os

            if self.gemma3_tokenizer_path:
                os.environ.setdefault(
                    "LAP_TPU_GEMMA3_TOKENIZER_MODEL", self.gemma3_tokenizer_path
                )
            return Gemma3Tokenizer(num_images=len(model_config.image_keys), **kwargs)
        return PaligemmaTokenizer(**kwargs)

    def __call__(self, model_config: LAPConfig) -> Group:
        if model_config.use_fast:
            from lap_tpu.models.fast_tokenizer import (
                ExtractFASTActions,
                TokenizeFASTInputs,
                make_fast_tokenizer,
            )

            fast_tok = make_fast_tokenizer(
                model_config,
                prompt_format=self.prompt_format,
                prediction_format=self.prediction_format,
                gemma3_tokenizer_path=self.gemma3_tokenizer_path,
            )
            return Group(
                inputs=(
                    InjectDefaultPrompt(self.default_prompt),
                    TokenizeFASTInputs(
                        fast_tok,
                        discrete_state_input=model_config.discrete_state_input,
                        state_dropout=model_config.state_dropout,
                    ),
                ),
                outputs=(
                    ExtractFASTActions(
                        fast_tok,
                        action_horizon=model_config.action_horizon,
                        action_dim=model_config.action_dim,
                    ),
                ),
            )
        outputs = ()
        if self.include_outputs:
            outputs = (DetokenizeReasoning(self._create_tokenizer(model_config, 0.0)),)
        return Group(
            inputs=(
                InjectDefaultPrompt(self.default_prompt),
                TokenizePromptAndReasoning(
                    self._create_tokenizer(model_config, model_config.reasoning_mask_prob),
                    discrete_state_input=model_config.discrete_state_input,
                    verbose_mode=model_config.verbose_mode,
                    state_dropout=model_config.state_dropout,
                ),
                PadStates(model_config.action_dim),
            ),
            outputs=outputs,
        )


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Top-level experiment config (reference config.py:507-603)."""

    name: str = "lap"
    exp_name: str = "default"
    project_name: str = "lap_tpu"

    model: LAPConfig = dataclasses.field(default_factory=lambda: LAPConfig())
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    weight_loader: weight_loaders.WeightLoaderChoice = dataclasses.field(
        default_factory=weight_loaders.WeightLoaderChoice
    )
    lr_schedule: _optimizer.CosineDecaySchedule = dataclasses.field(
        default_factory=lambda: _optimizer.CosineDecaySchedule(
            warmup_steps=5_000, peak_lr=1e-4, decay_steps=40_000, decay_lr=1e-5
        )
    )
    optimizer: _optimizer.AdamW = dataclasses.field(
        default_factory=lambda: _optimizer.AdamW(weight_decay=0.0001)
    )

    batch_size: int = 2048
    num_train_steps: int = 40_000
    save_interval: int = 1000
    log_interval: int = 50
    keep_period: int | None = 5000
    resume: bool = True
    overwrite: bool = False
    seed: int = 0

    ema_decay: float | None = 0.999
    ema_schedule_choice: _optimizer.EmaScheduleChoice = dataclasses.field(
        default_factory=lambda: _optimizer.EmaScheduleChoice(
            kind="cosine_delayed", start_step=5000
        )
    )

    fsdp_devices: int = 1
    tp_devices: int = 1
    # GPipe pipeline parallelism: shard the LLM's layer stack over a pp mesh
    # axis (parallel/pipeline.py). Composes with dp and with fsdp WITHIN each
    # stage; rejected with tp_devices > 1. pp_microbatches is the GPipe
    # microbatch count per data-parallel shard — bubble fraction is
    # (pp-1)/(M+pp-1), so M >= 2*pp keeps it under ~33%.
    pp_devices: int = 1
    pp_microbatches: int = 4
    # Megatron-style sequence parallelism: with tp_devices > 1, keep the
    # residual stream token-sharded over the tp axis between attention/MLP
    # regions (reduce-scatter + all-gather instead of all-reduce; 1/tp the
    # inter-region activation memory). Numerically identical to tp-only.
    sequence_parallel: bool = False
    param_dtype: str = "float32"

    checkpoint_base_dir: str = "./checkpoints"
    assets_base_dir: str = "./assets"

    use_validation: bool = False
    val_interval: int = 2000
    allow_partial_weights: bool = True
    freeze_vlm: bool = False

    eval_checkpoint_step: int | None = None
    eval_checkpoint_steps: tuple[int, ...] | None = None
    eval_all_checkpoints: bool = True
    eval_start_from_step: int | None = None
    num_eval_batches: int | None = 500
    eval_use_ema: bool = True
    eval_split: Literal["val", "train"] = "val"

    wandb_enabled: bool = False

    @property
    def assets_dirs(self) -> pathlib.Path:
        return pathlib.Path(self.assets_base_dir) / self.name

    @property
    def checkpoint_dir(self) -> pathlib.Path:
        if not self.exp_name:
            raise ValueError("--exp_name must be set")
        return pathlib.Path(self.checkpoint_base_dir) / self.name / self.exp_name

    @property
    def ema_schedule(self) -> _optimizer.EmaSchedule | None:
        if self.ema_schedule_choice.kind == "cosine_delayed":
            # Cosine ramp handled dynamically in get_ema_decay_for_step.
            return None
        return self.ema_schedule_choice.build(decay=self.ema_decay)

    def get_ema_decay_for_step(self, step):
        """jit-compatible (decay, enabled) for a traced step, incl. the
        cosine-delayed ramp (reference config.py:561-590)."""
        import jax.numpy as jnp

        if self.ema_schedule_choice.kind == "cosine_delayed":
            if self.ema_decay is None:
                return jnp.asarray(0.0, jnp.float32), jnp.asarray(False)
            start = self.ema_schedule_choice.start_step
            duration = max(self.num_train_steps - start, 1)
            progress = jnp.clip((step - start) / duration, 0.0, 1.0)
            decay = self.ema_decay * (1.0 - jnp.cos(jnp.pi * progress)) / 2.0
            return decay, step >= start
        schedule = self.ema_schedule_choice.build(decay=self.ema_decay)
        if schedule is not None:
            return schedule.get_decay_for_step(step)
        if self.ema_decay is None:
            return jnp.asarray(0.0, jnp.float32), jnp.asarray(False)
        return jnp.asarray(self.ema_decay, jnp.float32), jnp.asarray(True)

    @property
    def has_ema(self) -> bool:
        return self.ema_decay is not None and self.ema_schedule_choice.kind != "disabled"


def _libero_data(**kw) -> DataConfig:
    return DataConfig(
        shuffle_buffer_size=100_000,
        repo_id="libero",
        asset_id="libero",
        data_mix="libero_finetune",
        val_fraction=0.0,
        **kw,
    )


_FINETUNE_LR = _optimizer.CosineDecaySchedule(
    warmup_steps=1000, peak_lr=5e-5, decay_steps=40_000, decay_lr=5e-5
)


_CONFIGS = [
    TrainConfig(
        name="lap",
        data=DataConfig(random_base_prob=0.5),
        model=LAPConfig(
            action_dim=7,
            action_horizon=16,
            max_token_len=180,
            enable_action_training=True,
            stop_action_to_vlm_grad=True,
        ),
        batch_size=2048,
    ),
    TrainConfig(
        name="pi05_replicated",
        model=LAPConfig(
            action_dim=7,
            action_horizon=16,
            max_token_len=220,
            use_fast=True,
            enable_action_training=True,
            stop_action_to_vlm_grad=True,
        ),
        batch_size=2048,
    ),
    TrainConfig(
        name="pi0_replicated",
        model=LAPConfig(
            action_dim=7,
            action_horizon=16,
            max_token_len=220,
            enable_action_training=True,
            enable_langact_training=False,
        ),
        batch_size=2048,
    ),
    TrainConfig(
        name="lap_gemma3_4b",
        model=LAPConfig(
            action_dim=7,
            action_horizon=16,
            enable_action_training=True,
            enable_langact_training=True,
            max_token_len=800,
            paligemma_variant="gemma3_4b",
            action_expert_variant="gemma3_300m",
        ),
        batch_size=2048,
        weight_loader=weight_loaders.WeightLoaderChoice(kind="gemma3"),
    ),
    TrainConfig(
        name="fast_gemma3_4b",
        model=LAPConfig(
            action_dim=7,
            action_horizon=16,
            enable_action_training=True,
            enable_langact_training=True,
            max_token_len=800,
            paligemma_variant="gemma3_4b",
            action_expert_variant="gemma3_300m",
            use_fast=True,
        ),
        weight_loader=weight_loaders.WeightLoaderChoice(kind="gemma3"),
        batch_size=2048,
    ),
    TrainConfig(
        name="lap_gemma3_12b",
        model=LAPConfig(
            action_dim=7,
            action_horizon=16,
            enable_action_training=True,
            enable_langact_training=True,
            max_token_len=800,
            paligemma_variant="gemma3_12b",
            action_expert_variant="gemma3_300m_48",
        ),
        weight_loader=weight_loaders.WeightLoaderChoice(
            kind="gemma3", params_path="checkpoints/gemma3-12b-it"
        ),
        batch_size=2048,
    ),
    TrainConfig(
        name="lap_gemma3_27b",
        model=LAPConfig(
            action_dim=7,
            action_horizon=16,
            enable_action_training=True,
            enable_langact_training=True,
            max_token_len=800,
            paligemma_variant="gemma3_27b",
            action_expert_variant="gemma3_300m_62",
        ),
        weight_loader=weight_loaders.WeightLoaderChoice(
            kind="gemma3", params_path="checkpoints/gemma3-27b-it"
        ),
        batch_size=2048,
    ),
    TrainConfig(
        name="vla0_replicated",
        model=LAPConfig(
            action_dim=7,
            action_horizon=10,
            max_token_len=390,
            pi05=True,
            discrete_state_input=True,
            enable_action_training=False,
            enable_langact_training=True,
            prompt_format="vla0_chunked",
        ),
        data=DataConfig(
            language_action_format_name="vla0_chunked", transform_strategy="vla0"
        ),
        batch_size=2048,
    ),
    TrainConfig(
        name="vla0_replicated_libero",
        model=LAPConfig(
            action_dim=7,
            action_horizon=10,
            max_token_len=390,
            enable_action_training=False,
            enable_langact_training=True,
            prompt_format="vla0_chunked",
            reasoning_mask_prob=0.2,
        ),
        data=_libero_data(
            language_action_format_name="vla0_chunked", transform_strategy="vla0"
        ),
        lr_schedule=_FINETUNE_LR,
        save_interval=2000,
        keep_period=2000,
        num_train_steps=40_001,
        batch_size=256,
        ema_schedule_choice=_optimizer.EmaScheduleChoice(
            kind="cosine_delayed", start_step=1000
        ),
    ),
    TrainConfig(
        name="lap_libero",
        model=LAPConfig(
            action_dim=7,
            action_horizon=10,
            max_token_len=180,
            enable_action_training=True,
            stop_action_to_vlm_grad=False,
            language_loss_weight=0.4,
            enable_image_augmentation=False,
        ),
        data=_libero_data(),
        lr_schedule=_FINETUNE_LR,
        weight_loader=weight_loaders.WeightLoaderChoice(
            kind="checkpoint", params_path="checkpoints/lap/params"
        ),
        save_interval=2000,
        keep_period=2000,
        num_train_steps=40_001,
        batch_size=256,
        ema_schedule_choice=_optimizer.EmaScheduleChoice(kind="constant"),
    ),
    TrainConfig(
        name="lap_cotrain",
        model=LAPConfig(
            action_dim=7,
            action_horizon=16,
            max_token_len=220,
            enable_action_training=True,
            enable_prediction_training=True,
            stop_action_to_vlm_grad=True,
        ),
        batch_size=2048,
    ),
    TrainConfig(
        name="lap_gemma3_4b_libero",
        model=LAPConfig(
            action_dim=7,
            action_horizon=10,
            enable_action_training=True,
            enable_langact_training=True,
            max_token_len=800,
            paligemma_variant="gemma3_4b",
            action_expert_variant="gemma3_300m",
            language_loss_weight=0.4,
            enable_image_augmentation=False,
        ),
        batch_size=2048,
        weight_loader=weight_loaders.WeightLoaderChoice(
            kind="gemma3", params_path="checkpoints/gemma3-4b-it"
        ),
        data=_libero_data(),
        lr_schedule=_FINETUNE_LR,
        save_interval=2000,
        keep_period=2000,
        num_train_steps=40_001,
        ema_schedule_choice=_optimizer.EmaScheduleChoice(
            kind="cosine_delayed", start_step=1000
        ),
    ),
    # Debug config: tiny model + synthetic data, runs anywhere.
    TrainConfig(
        name="debug",
        model=LAPConfig(
            dtype="float32",
            paligemma_variant="dummy",
            action_expert_variant="dummy",
            siglip_variant="dummy",
            action_dim=7,
            action_horizon=4,
            max_token_len=160,
            image_resolution=(56, 56),
            enable_action_training=True,
            enable_langact_training=True,
        ),
        data=DataConfig(repo_id="fake", asset_id="fake", data_mix=None, val_fraction=0.0),
        lr_schedule=_optimizer.CosineDecaySchedule(
            warmup_steps=10, peak_lr=1e-3, decay_steps=100, decay_lr=1e-4
        ),
        batch_size=8,
        num_train_steps=20,
        save_interval=10,
        log_interval=5,
        ema_decay=None,
        wandb_enabled=False,
    ),
]

if len({c.name for c in _CONFIGS}) != len(_CONFIGS):
    raise ValueError("Config names must be unique.")
_CONFIGS_DICT = {c.name: c for c in _CONFIGS}


def get_config(config_name: str) -> TrainConfig:
    if config_name in _CONFIGS_DICT:
        return _CONFIGS_DICT[config_name]
    closest = difflib.get_close_matches(config_name, _CONFIGS_DICT.keys(), n=3, cutoff=0.0)
    hint = f" Did you mean one of: {', '.join(map(repr, closest))}?" if closest else ""
    raise ValueError(f"Config {config_name!r} not found.{hint}")


def cli(argv: list[str] | None = None) -> TrainConfig:
    return _cli.overridable_config_cli(_CONFIGS_DICT, argv)
