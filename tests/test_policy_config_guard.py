"""Serving a trained checkpoint through the built-in TEST tokenizer vocab
must hard-fail (VERDICT r3: a real checkpoint restored over the test vocab
serves garbage reasoning text through a single log line). The explicit
``allow_test_vocab=True`` escape hatch is for fabricated test checkpoints
like the one built here."""

from __future__ import annotations

import jax
import orbax.checkpoint as ocp
import pytest

from lap_tpu.policies import policy_config
from lap_tpu.training import config as config_mod


@pytest.fixture(scope="module")
def debug_checkpoint(tmp_path_factory):
    ckpt_dir = tmp_path_factory.mktemp("ckpt")
    train_config = config_mod.get_config("debug")
    model = train_config.model.create_module()
    params = model.init(
        jax.random.PRNGKey(0), jax.random.PRNGKey(0), method=model.init_params_fn
    )["params"]
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save((ckpt_dir / "params").resolve(), {"params": params})
    return train_config, ckpt_dir


def test_test_vocab_refused_without_optin(debug_checkpoint, monkeypatch):
    train_config, ckpt_dir = debug_checkpoint
    monkeypatch.delenv("LAP_TPU_TOKENIZER_MODEL", raising=False)
    with pytest.raises(RuntimeError, match="TEST tokenizer vocabulary"):
        policy_config.create_trained_policy(train_config, ckpt_dir)
    with pytest.raises(RuntimeError, match="TEST tokenizer vocabulary"):
        policy_config.create_trained_policy_ar(train_config, ckpt_dir)


def test_test_vocab_escape_hatch(debug_checkpoint, monkeypatch):
    train_config, ckpt_dir = debug_checkpoint
    monkeypatch.delenv("LAP_TPU_TOKENIZER_MODEL", raising=False)
    policy = policy_config.create_trained_policy(
        train_config, ckpt_dir, allow_test_vocab=True
    )
    assert policy.metadata["mode"] == "flow"
