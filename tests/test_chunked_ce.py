"""Chunked language cross-entropy: numerics identical to single-shot.

The [B, T, V] logits tensor is the largest activation in the train step at
Gemma3's 800-token budget (6.7 GB f32 at batch 8); ``LAP._token_logp_and_pred``
computes the per-token label log-prob in token chunks under jax.checkpoint so
it is never materialized. Loss, verbose token metrics, AND gradients must
match the single-shot log_softmax path bit-tight in f32 (each token's
logsumexp is a full-vocab reduction either way).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lap_tpu.models.lap_model import LAP, LAPConfig

TINY = LAPConfig(
    dtype="float32",
    paligemma_variant="dummy",
    action_expert_variant="dummy",
    siglip_variant="dummy",
    action_dim=7,
    action_horizon=4,
    max_token_len=22,  # 21 shifted positions: 6 chunks of 4 with ragged tail
    image_resolution=(28, 28),
    enable_action_training=True,
    enable_langact_training=True,
)


def _batch(b=4):
    rng = np.random.default_rng(0)
    obs = TINY.fake_obs(b)
    t = TINY.max_token_len
    langact = np.zeros((b, t), bool)
    langact[:, 8:] = True
    obs = obs.replace(
        tokenized_prompt=jnp.asarray(rng.integers(3, 200, (b, t)), jnp.int32),
        tokenized_langact_mask=jnp.asarray(langact),
        token_loss_mask=jnp.ones((b, t), bool),
        critical_token_mask=jnp.asarray(rng.integers(0, 2, (b, t)).astype(bool)),
        number_token_mask=jnp.asarray(rng.integers(0, 2, (b, t)).astype(bool)),
    )
    return obs, jnp.asarray(rng.normal(size=(b, 4, 7)), jnp.float32)


@pytest.mark.parametrize("chunk", [4, 7])
def test_chunked_ce_matches_single_shot(chunk, monkeypatch):
    obs, actions = _batch()
    model = LAP(config=TINY)
    params = model.init(
        jax.random.PRNGKey(0), jax.random.PRNGKey(0), obs, actions,
        method=model.compute_loss,
    )

    def loss_and_metrics(p):
        return model.apply(
            p, jax.random.PRNGKey(1), obs, actions,
            train=False, verbose_mode=True, method=model.compute_loss,
        )

    (loss_ref, metrics_ref), grads_ref = jax.jit(
        jax.value_and_grad(lambda p: loss_and_metrics(p), has_aux=True)
    )(params)

    monkeypatch.setattr(LAP, "CE_CHUNK", chunk)
    model2 = LAP(config=TINY)
    (loss_c, metrics_c), grads_c = jax.jit(
        jax.value_and_grad(
            lambda p: model2.apply(
                p, jax.random.PRNGKey(1), obs, actions,
                train=False, verbose_mode=True, method=model2.compute_loss,
            ),
            has_aux=True,
        )
    )(params)

    np.testing.assert_allclose(float(loss_c), float(loss_ref), rtol=1e-6)
    for k in metrics_ref:
        np.testing.assert_allclose(
            np.asarray(metrics_c[k]), np.asarray(metrics_ref[k]), rtol=1e-5,
            err_msg=k,
        )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
        ),
        grads_c,
        grads_ref,
    )
