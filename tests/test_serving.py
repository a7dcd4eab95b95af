import threading
import time

import jax
import numpy as np

from lap_tpu.models.lap_model import LAPConfig
from lap_tpu.models.tokenizer import PaligemmaTokenizer
from lap_tpu.policies.input_transforms import CoTInputs
from lap_tpu.policies.model_transforms import (
    InjectDefaultPrompt,
    Normalize,
    NormStats,
    PadStates,
    TokenizePromptAndReasoning,
    Unnormalize,
)
from lap_tpu.policies.policy import Policy
from lap_tpu.serving import msgpack_numpy
from lap_tpu.serving.websocket_client_policy import WebsocketClientPolicy
from lap_tpu.serving.websocket_policy_server import WebsocketPolicyServer

TINY = LAPConfig(
    dtype="float32",
    paligemma_variant="dummy",
    action_expert_variant="dummy",
    siglip_variant="dummy",
    action_dim=7,
    action_horizon=4,
    max_token_len=48,
    image_resolution=(56, 56),
    enable_action_training=True,
    enable_langact_training=True,
)


def test_msgpack_numpy_roundtrip():
    data = {
        "a": np.arange(12, dtype=np.float32).reshape(3, 4),
        "b": {"c": np.bool_(True), "d": "text", "e": 3},
        "img": np.zeros((4, 4, 3), np.uint8),
    }
    out = msgpack_numpy.unpackb(msgpack_numpy.packb(data))
    np.testing.assert_array_equal(out["a"], data["a"])
    assert out["b"]["d"] == "text"
    assert out["img"].dtype == np.uint8


def _build_policy():
    model = TINY.create_module()
    params = model.init(
        jax.random.PRNGKey(0), jax.random.PRNGKey(0), method=model.init_params_fn
    )
    tokenizer = PaligemmaTokenizer(max_len=TINY.max_token_len)
    norm_stats = {
        "state": NormStats(mean=np.zeros(7), std=np.ones(7)),
        "actions": NormStats(mean=np.zeros(7), std=np.ones(7)),
    }
    input_transforms = [
        InjectDefaultPrompt("do something"),
        CoTInputs(action_dim=TINY.action_dim, language_action_format="verbose_with_rotation"),
        Normalize(norm_stats, normalization_type="normal"),
        PadStates(TINY.action_dim),
        TokenizePromptAndReasoning(tokenizer=tokenizer, discrete_state_input=True),
    ]
    output_transforms = [Unnormalize(norm_stats, normalization_type="normal")]
    return Policy(
        model,
        params,
        input_transforms=input_transforms,
        output_transforms=output_transforms,
        num_steps=2,
        metadata={"model": "tiny-lap"},
    )


def _obs():
    img = np.random.default_rng(0).integers(0, 255, (56, 56, 3), np.uint8)
    return {
        "observation": {
            "base_0_rgb": img,
            "left_wrist_0_rgb": img,
            "state": np.zeros(7, np.float32),
        },
        "prompt": "pick up the cup",
    }


def test_policy_infer_direct():
    policy = _build_policy()
    result = policy.infer(_obs())
    assert result["actions"].shape == (TINY.action_horizon, TINY.action_dim)
    assert np.isfinite(result["actions"]).all()
    assert result["policy_timing"]["infer_ms"] > 0


def test_websocket_roundtrip():
    policy = _build_policy()
    server = WebsocketPolicyServer(policy, host="127.0.0.1", port=18473)

    import asyncio

    loop = asyncio.new_event_loop()

    def run():
        asyncio.set_event_loop(loop)
        loop.run_until_complete(server.run())

    t = threading.Thread(target=run, daemon=True)
    t.start()
    time.sleep(0.5)

    client = WebsocketClientPolicy(host="127.0.0.1", port=18473)
    assert client.get_server_metadata() == {"model": "tiny-lap"}
    result = client.infer(_obs())
    assert result["actions"].shape == (TINY.action_horizon, TINY.action_dim)
    assert np.isfinite(result["actions"]).all()
    # Second request reuses the connection.
    result2 = client.infer(_obs())
    assert result2["actions"].shape == (TINY.action_horizon, TINY.action_dim)
    client.close()
    loop.call_soon_threadsafe(loop.stop)


# ---------------------------------------------------------------------------
# AR (language-action) policy path
# ---------------------------------------------------------------------------


def _build_ar_policy():
    from lap_tpu.policies.model_transforms import DetokenizeReasoning
    from lap_tpu.policies.output_transforms import CoTOutputs
    from lap_tpu.policies.policy import ARPolicy

    model = TINY.create_module()
    params = model.init(
        jax.random.PRNGKey(0), jax.random.PRNGKey(0), method=model.init_params_fn
    )
    tokenizer = PaligemmaTokenizer(max_len=TINY.max_token_len)
    norm_stats = {
        "state": NormStats(mean=np.zeros(7), std=np.ones(7)),
        "actions": NormStats(mean=np.zeros(7), std=np.ones(7)),
    }
    input_transforms = [
        InjectDefaultPrompt("do something"),
        CoTInputs(action_dim=TINY.action_dim, language_action_format="verbose_with_rotation"),
        Normalize(norm_stats, normalization_type="normal"),
        PadStates(TINY.action_dim),
        TokenizePromptAndReasoning(tokenizer=tokenizer, discrete_state_input=True),
    ]
    output_transforms = [
        DetokenizeReasoning(tokenizer),
        CoTOutputs(language_action_format="verbose_with_rotation"),
    ]
    return ARPolicy(
        model,
        params,
        input_transforms=input_transforms,
        output_transforms=output_transforms,
        max_decoding_steps=8,
        metadata={"model": "tiny-lap-ar"},
    )


def test_ar_policy_infer_end_to_end():
    """sample_tokens -> detokenize -> regex parse -> action deltas. The
    random model emits arbitrary tokens, so we assert structure: a [6] or
    [7] action vector of finite deltas, a (possibly empty) reasoning
    string, and timing (reference ARPolicy contract, policy_adapter.py)."""
    policy = _build_ar_policy()
    result = policy.infer(_obs())
    actions = np.asarray(result["actions"])
    assert actions.shape in ((6,), (7,))
    assert np.isfinite(actions).all()
    assert "reasoning" in result
    assert result["policy_timing"]["infer_ms"] > 0
    # Consecutive calls advance the sampling rng / decode step without error.
    result2 = policy.infer(_obs())
    assert np.isfinite(np.asarray(result2["actions"])).all()


def test_ar_policy_over_websocket():
    policy = _build_ar_policy()
    server = WebsocketPolicyServer(policy, host="127.0.0.1", port=18474)

    import asyncio

    loop = asyncio.new_event_loop()

    def run():
        asyncio.set_event_loop(loop)
        loop.run_until_complete(server.run())

    t = threading.Thread(target=run, daemon=True)
    t.start()
    time.sleep(0.5)
    client = WebsocketClientPolicy(host="127.0.0.1", port=18474)
    assert client.get_server_metadata() == {"model": "tiny-lap-ar"}
    result = client.infer(_obs())
    assert np.isfinite(np.asarray(result["actions"])).all()
    client.close()
    loop.call_soon_threadsafe(loop.stop)


def test_concurrent_clients_get_unique_sampling_steps():
    """Two clients through the threaded server concurrently: both must get
    valid results and the per-request step counter must never hand out the
    same sampling key twice (BasePolicy._next_step is locked)."""
    policy = _build_policy()
    server = WebsocketPolicyServer(policy, host="127.0.0.1", port=18475)

    import asyncio
    from concurrent.futures import ThreadPoolExecutor

    loop = asyncio.new_event_loop()

    def run():
        asyncio.set_event_loop(loop)
        loop.run_until_complete(server.run())

    t = threading.Thread(target=run, daemon=True)
    t.start()
    time.sleep(0.5)

    def one_client(n):
        client = WebsocketClientPolicy(host="127.0.0.1", port=18475)
        outs = [client.infer(_obs()) for _ in range(n)]
        client.close()
        return outs

    with ThreadPoolExecutor(2) as ex:
        futs = [ex.submit(one_client, 4) for _ in range(2)]
        results = [f.result() for f in futs]
    for outs in results:
        for r in outs:
            assert np.isfinite(r["actions"]).all()
    assert policy._step == 8  # every request consumed a unique step
    loop.call_soon_threadsafe(loop.stop)


# ---------------------------------------------------------------------------
# Prompt-length bucketing (token_bucket)
# ---------------------------------------------------------------------------


def test_trim_token_pad_unit():
    from lap_tpu.policies.policy import _trim_token_pad

    batch = {
        "tokenized_prompt": np.arange(2 * 48).reshape(2, 48).astype(np.int32),
        "tokenized_prompt_mask": np.pad(
            np.ones((2, 19), bool), ((0, 0), (0, 29))
        ),
        "token_loss_mask": np.zeros((2, 48), bool),
        "tokenized_dataset_name": np.zeros((2, 100), np.int32),
        "state": np.zeros((2, 7), np.float32),
    }
    out = _trim_token_pad(batch, 8)
    # 19 valid tokens -> 24-bucket; only token-axis keys sliced.
    assert out["tokenized_prompt"].shape == (2, 24)
    assert out["tokenized_prompt_mask"].shape == (2, 24)
    assert out["token_loss_mask"].shape == (2, 24)
    assert out["tokenized_dataset_name"].shape == (2, 100)
    assert out["state"].shape == (2, 7)
    np.testing.assert_array_equal(
        out["tokenized_prompt"], batch["tokenized_prompt"][:, :24]
    )
    # No valid tokens dropped, and a bucket >= max_token_len is a no-op.
    assert out["tokenized_prompt_mask"].sum() == 2 * 19
    assert _trim_token_pad(batch, 64) is batch


def _build_policy_bucketed(token_bucket):
    policy = _build_policy()
    policy._token_bucket = token_bucket
    return policy


def test_token_bucket_flow_matches_full_length():
    full = _build_policy()
    trimmed = _build_policy_bucketed(8)
    r_full = full.infer(_obs())
    r_trim = trimmed.infer(_obs())
    # Padded positions carry exactly zero attention weight: trimming them
    # changes only float reduction order.
    np.testing.assert_allclose(
        r_full["actions"], r_trim["actions"], rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(r_full["state"], r_trim["state"], rtol=1e-5)


def test_token_bucket_ar_greedy_matches_full_length():
    full = _build_ar_policy()
    trimmed = _build_ar_policy()
    trimmed._token_bucket = 8
    r_full = full.infer(_obs())
    r_trim = trimmed.infer(_obs())
    np.testing.assert_allclose(
        np.asarray(r_full["actions"]), np.asarray(r_trim["actions"]), atol=1e-5
    )
    assert r_full.get("reasoning", "") == r_trim.get("reasoning", "")
