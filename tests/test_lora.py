"""LoRA fine-tuning end to end (reference lap_config.py:132-170 semantics).

A lora-variant backbone must (a) create fresh lora_a/lora_b adapters that
start as a no-op (zero-init B), (b) freeze exactly the base llm weights via
get_freeze_filter while adapters + non-llm heads stay trainable, and (c)
actually learn through the adapters: frozen weights bit-unchanged after
optimizer steps, adapters changed, loss decreasing.
"""

import jax
import jax.numpy as jnp
import numpy as np

from lap_tpu.models.lap_model import LAPConfig, get_freeze_filter
from lap_tpu.training.optimizer import (
    AdamW,
    CosineDecaySchedule,
    create_optimizer,
    freeze_mask_from_filter,
)

CFG = LAPConfig(
    dtype="float32",
    paligemma_variant="dummy_lora",
    action_expert_variant="dummy",
    siglip_variant="dummy",
    action_dim=7,
    action_horizon=4,
    max_token_len=16,
    image_resolution=(28, 28),
    enable_action_training=True,
    enable_langact_training=True,
)


def _flat(params):
    return {
        "/".join(str(getattr(k, "key", k)) for k in path): leaf
        for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]
    }


def test_lora_params_exist_and_start_as_noop():
    model = CFG.create_module()
    variables = model.init(
        jax.random.PRNGKey(0), jax.random.PRNGKey(0), method=model.init_params_fn
    )
    flat = _flat(variables["params"])
    lora_a = [k for k in flat if "lora_a" in k]
    lora_b = [k for k in flat if "lora_b" in k]
    assert lora_a and lora_b, "lora adapters missing from the param tree"
    # Zero-init B => adapters are a no-op at init: outputs must match the
    # plain variant given identical base weights. Cheap proxy: all B zero.
    for k in lora_b:
        assert float(jnp.abs(flat[k]).max()) == 0.0

    # Expert-1 (plain dummy) must NOT have adapters; expert-0 must.
    assert all("_1" not in k for k in lora_a)


def test_lora_freeze_filter_semantics():
    frozen = get_freeze_filter(CFG)
    assert frozen is not None
    # Base llm weights freeze; adapters and non-llm (incl. img, projections)
    # stay trainable. Expert-1 (non-lora) also freezes? Reference: pali_lora
    # only -> freeze llm minus `_1` suffix (lap_config.py:158-166).
    assert frozen("llm/layers/attn/qkv_einsum/w")
    assert not frozen("llm/layers/attn/qkv_einsum/lora_a")
    assert not frozen("llm/layers/attn_1/q_einsum/w")  # action expert trains
    assert not frozen("img/Transformer_encoderblock/Dense_0/kernel")
    assert not frozen("action_out_proj/kernel")


def test_lora_training_updates_adapters_only_in_frozen_base():
    model = CFG.create_module()
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, rng, method=model.init_params_fn)
    params = variables["params"]

    tx = create_optimizer(
        AdamW(clip_gradient_norm=1.0),
        CosineDecaySchedule(warmup_steps=2, peak_lr=2e-3, decay_steps=100),
        freeze_mask=freeze_mask_from_filter(params, get_freeze_filter(CFG)),
    )
    opt_state = tx.init(params)

    obs = CFG.fake_obs(2)
    obs = obs.replace(
        tokenized_prompt=jnp.tile(jnp.arange(CFG.max_token_len, dtype=jnp.int32)[None], (2, 1)),
        tokenized_langact_mask=jnp.tile((jnp.arange(CFG.max_token_len) >= 8)[None], (2, 1)),
        token_loss_mask=jnp.ones((2, CFG.max_token_len), bool),
    )
    actions = CFG.fake_actions(2)

    def loss_fn(p, r):
        loss, _ = model.apply(
            {"params": p}, r, obs, actions, train=True, method=model.compute_loss
        )
        return loss

    @jax.jit
    def step(p, o, r):
        loss, grads = jax.value_and_grad(loss_fn)(p, r)
        updates, o = tx.update(grads, o, p)
        import optax

        return optax.apply_updates(p, updates), o, loss

    before = _flat(jax.tree.map(np.asarray, params))
    losses = []
    for i in range(8):
        params, opt_state, loss = step(params, opt_state, jax.random.fold_in(rng, i))
        losses.append(float(loss))
    after = _flat(jax.tree.map(np.asarray, params))

    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"
    changed_lora = unchanged_base = changed_base = 0
    for k in before:
        same = np.array_equal(before[k], after[k])
        if "lora_" in k:
            changed_lora += 0 if same else 1
        elif k.startswith("llm/") and "_1" not in k:
            if same:
                unchanged_base += 1
            else:
                changed_base += 1
    assert changed_lora > 0, "no lora adapter changed"
    assert changed_base == 0, f"{changed_base} frozen base weights changed"
    assert unchanged_base > 0
