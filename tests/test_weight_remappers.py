"""Round-trip tests for the released-weight remappers.

Fabricates checkpoints in the REAL source layouts and asserts the loaders
produce scan-stacked trees the models consume, values conserved:

- big_vision PaliGemma ``.npz`` (``params/img/Transformer/encoderblock/...``)
  -> PaliGemmaWeightLoader (reference weight_loaders.py:109-124)
- raw Gemma3-IT orbax export (``transformer/layer_N/...``,
  ``SigLiPFromPatches_0/siglip_encoder/Transformer/encoderblock_N/...``,
  embedder multimodal specials) -> Gemma3ScanCompatibleWeightLoader
  (reference weight_loaders.py:281-628, conservation check :598-620)
"""

import io
from pathlib import Path

import jax
import numpy as np
import orbax.checkpoint as ocp
import pytest

from lap_tpu.training.gemma3_weights import (
    Gemma3ScanCompatibleWeightLoader,
    remap_gemma3_export,
    resize_pos_embedding,
    stack_scan_layers,
)
from lap_tpu.training.weight_loaders import PaliGemmaWeightLoader, flatten


@pytest.fixture(scope="module")
def lap_params():
    from tests.test_golden_parity import _tiny_model

    _, _, params = _tiny_model()
    return params["params"]


@pytest.fixture(scope="module")
def gemma3_params():
    from lap_tpu.models.lap_model import LAPConfig

    cfg = LAPConfig(
        dtype="float32",
        paligemma_variant="gemma3_dummy",
        action_expert_variant="gemma3_dummy",
        siglip_variant="dummy",
        action_dim=7,
        action_horizon=4,
        max_token_len=80,
        image_resolution=(56, 56),
        enable_action_training=True,
        enable_langact_training=True,
    )
    model = cfg.create_module()
    params = model.init(
        jax.random.PRNGKey(0), jax.random.PRNGKey(0), method=model.init_params_fn
    )
    return params["params"]


# ---------------------------------------------------------------------------
# PaliGemma big_vision .npz
# ---------------------------------------------------------------------------


def _bv_npz_key(key: str) -> str | None:
    """Map our flat param path to the big_vision npz key, or None if the
    param is not part of the released PaliGemma checkpoint."""
    if "_1" in key or key.startswith(("action_", "time_mlp", "state_proj")):
        return None
    key = key.replace("Transformer_encoderblock/", "Transformer/encoderblock/")
    key = key.replace("Transformer_encoder_norm/", "Transformer/encoder_norm/")
    return "params/" + key


def test_paligemma_npz_roundtrip(tmp_path, lap_params):
    flat = flatten(lap_params)
    npz = {}
    for key, val in flat.items():
        bv = _bv_npz_key(key)
        if bv is not None:
            npz[bv] = np.asarray(val)
    assert any("Transformer/encoderblock" in k for k in npz)
    buf = io.BytesIO()
    np.savez(buf, **npz)
    path = tmp_path / "pt_224.npz"
    path.write_bytes(buf.getvalue())

    loaded = PaliGemmaWeightLoader(str(path)).load(lap_params)
    flat_loaded = flatten(loaded)
    assert set(flat_loaded) == set(flat)
    for key, val in flat.items():
        np.testing.assert_array_equal(
            np.asarray(flat_loaded[key]), np.asarray(val), err_msg=key
        )


def test_paligemma2_bf16_npz_recovers_dtype(tmp_path, lap_params):
    """PaliGemma2 npz exports store bfloat16 arrays, which np.save writes
    as 2-byte void (reference weight_loaders.py:25-30 recover_dtype +
    PaliGemma2WeightLoader :127-140). The loader must view them back to
    bf16 with values conserved — NOT pass void arrays downstream."""
    import jax.numpy as jnp

    flat = flatten(lap_params)
    npz = {}
    for key, val in flat.items():
        bv = _bv_npz_key(key)
        if bv is not None:
            npz[bv] = np.asarray(jnp.asarray(val, jnp.bfloat16))
    buf = io.BytesIO()
    np.savez(buf, **npz)
    path = tmp_path / "pt_224_bf16.npz"
    path.write_bytes(buf.getvalue())

    # np.load really does hand back void-2 for these (the premise).
    raw = dict(np.load(io.BytesIO(path.read_bytes()), allow_pickle=False))
    assert any(v.dtype.type is np.void and v.itemsize == 2 for v in raw.values())

    loaded = PaliGemmaWeightLoader(str(path)).load(lap_params)
    flat_loaded = flatten(loaded)
    for key, val in flat.items():
        got = flat_loaded[key]
        if _bv_npz_key(key) is None:
            continue  # fresh init, untouched
        assert np.asarray(got).dtype != np.dtype("V2"), key
        np.testing.assert_array_equal(
            np.asarray(got, np.float32),
            np.asarray(jnp.asarray(val, jnp.bfloat16), np.float32),
            err_msg=key,
        )


def test_weight_loader_choice_paligemma2_kind():
    from lap_tpu.training.weight_loaders import WeightLoaderChoice

    loader = WeightLoaderChoice(kind="paligemma2", params_path="x.npz").build()
    assert isinstance(loader, PaliGemmaWeightLoader)
    with pytest.raises(ValueError, match="params_path"):
        WeightLoaderChoice(kind="paligemma2").build()


def test_paligemma_npz_rejects_shape_mismatch(tmp_path, lap_params):
    flat = flatten(lap_params)
    npz = {_bv_npz_key(k): np.asarray(v) for k, v in flat.items() if _bv_npz_key(k)}
    npz["params/llm/final_norm/scale"] = np.zeros(3, np.float32)  # wrong shape
    buf = io.BytesIO()
    np.savez(buf, **npz)
    path = tmp_path / "bad.npz"
    path.write_bytes(buf.getvalue())
    with pytest.raises(ValueError, match="shape mismatch"):
        PaliGemmaWeightLoader(str(path)).load(lap_params)


# ---------------------------------------------------------------------------
# raw Gemma3-IT export
# ---------------------------------------------------------------------------


def _gemma3_source_keys(key: str, depth_of) -> list[tuple[str, int | None]]:
    """Our flat gemma3 param path -> [(raw export key, layer index or None)].

    Returns [] for params absent from the released export (action expert
    `_1` branches, time MLPs, adaRMS Dense)."""
    if "_1" in key or key.startswith(("action_", "time_mlp", "state_proj")):
        return []
    if key == "llm/embedder/input_embedding":
        return [("transformer/embedder/input_embedding", None)]
    if key == "llm/final_norm/scale":
        return [("transformer/final_norm/scale", None)]
    if key == "img/head/kernel":
        return [("transformer/embedder/mm_input_projection/w", None)]
    if key == "img/mm_soft_embedding_norm/scale":
        return [("transformer/embedder/mm_soft_embedding_norm/scale", None)]
    if key.startswith("llm/layers/"):
        sub = key.removeprefix("llm/layers/")
        sub = sub.replace("k_rmsnorm/", "_key_norm/").replace("q_rmsnorm/", "_query_norm/")
        if sub in ("mlp/gating_einsum", "mlp/linear"):
            sub = sub + "/w"
        return [(f"transformer/layer_{i}/{sub}", i) for i in range(depth_of(key))]
    if key.startswith("img/Transformer_encoderblock/"):
        sub = key.removeprefix("img/Transformer_encoderblock/")
        return [
            (f"SigLiPFromPatches_0/siglip_encoder/Transformer/encoderblock_{i}/{sub}", i)
            for i in range(depth_of(key))
        ]
    if key.startswith("img/"):
        return [("SigLiPFromPatches_0/siglip_encoder/" + key.removeprefix("img/"), None)]
    return []


def _fabricate_gemma3_export(flat: dict) -> dict:
    depth_of = lambda k: np.asarray(flat[k]).shape[0]  # noqa: E731
    src = {}
    for key, val in flat.items():
        arr = np.asarray(val)
        for raw_key, layer in _gemma3_source_keys(key, depth_of):
            src[raw_key] = arr if layer is None else arr[layer]
    return src


def _nest(flat: dict) -> dict:
    out: dict = {}
    for key, val in flat.items():
        node = out
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return out


def test_gemma3_export_remap_pure(gemma3_params):
    """Key surgery alone: every target key resolves, layers stacked in order."""
    flat = flatten(gemma3_params)
    src = _fabricate_gemma3_export(flat)
    remapped = remap_gemma3_export(src)
    for key, val in flat.items():
        if "_1" in key or key.startswith(("action_", "time_mlp", "state_proj")):
            continue
        assert key in remapped, f"{key} not produced by remap; got {sorted(remapped)[:8]}"
        np.testing.assert_array_equal(np.asarray(remapped[key]), np.asarray(val), err_msg=key)


def test_gemma3_loader_end_to_end(tmp_path, gemma3_params):
    """orbax save -> loader -> merged tree identical to the fabrication,
    fresh init preserved for the action expert, pos-emb resized."""
    flat = flatten(gemma3_params)
    src = _fabricate_gemma3_export(flat)
    # store the ViT pos embedding at an 8x8 grid; model wants 4x4 (16 tokens)
    rng = np.random.default_rng(3)
    big_pos = rng.normal(size=(1, 64, flat["img/pos_embedding"].shape[-1])).astype(np.float32)
    src["SigLiPFromPatches_0/siglip_encoder/pos_embedding"] = big_pos

    ckpt = tmp_path / "gemma3_export"
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(ckpt, _nest(src))

    loaded = Gemma3ScanCompatibleWeightLoader(str(ckpt)).load(gemma3_params)
    flat_loaded = flatten(loaded)
    assert set(flat_loaded) == set(flat)
    for key, val in flat.items():
        got = np.asarray(flat_loaded[key])
        if key == "img/pos_embedding":
            np.testing.assert_allclose(
                got, resize_pos_embedding(big_pos, 16), rtol=1e-6, atol=1e-6, err_msg=key
            )
            continue
        # everything else (incl. fresh-init action expert) must be bitwise
        np.testing.assert_array_equal(got, np.asarray(val), err_msg=key)


def test_gemma3_loader_missing_layer_raises(gemma3_params):
    flat = flatten(gemma3_params)
    src = _fabricate_gemma3_export(flat)
    src.pop("transformer/layer_2/attn/q_einsum/w")
    with pytest.raises(ValueError, match="missing layers"):
        remap_gemma3_export(src)


def test_stack_scan_layers_orders_numerically():
    flat = {f"llm/layer_{i}/w": np.full((2,), i, np.float32) for i in range(12)}
    stacked = stack_scan_layers(flat)
    assert list(stacked) == ["llm/layers/w"]
    np.testing.assert_array_equal(stacked["llm/layers/w"][:, 0], np.arange(12))


def test_resize_pos_embedding_identity_and_shape():
    pos = np.random.default_rng(0).normal(size=(1, 64, 8)).astype(np.float32)
    same = resize_pos_embedding(pos, 64)
    np.testing.assert_array_equal(same, pos)
    small = resize_pos_embedding(pos, 16)
    assert small.shape == (1, 16, 8)
    assert np.isfinite(small).all()
    # constant fields are preserved (to spline edge tolerance) by resampling
    const = np.ones((1, 64, 4), np.float32) * 3.25
    np.testing.assert_allclose(resize_pos_embedding(const, 16), np.ones((1, 16, 4)) * 3.25, atol=1e-4)


# ---------------------------------------------------------------------------
# scripts/convert_weights.py — standalone export -> servable checkpoint
# ---------------------------------------------------------------------------


def test_convert_weights_cli_paligemma(tmp_path):
    """Fabricated big_vision npz -> convert CLI -> create_trained_policy
    serves it, with the exported VLM values flowing through (not fresh init)."""
    import os
    import subprocess
    import sys

    from lap_tpu.policies import policy_config
    from lap_tpu.training import config as config_mod

    train_config = config_mod.get_config("debug")
    model = train_config.model.create_module()
    params = model.init(
        jax.random.PRNGKey(7), jax.random.PRNGKey(7), method=model.init_params_fn
    )["params"]
    flat = flatten(params)
    npz = {}
    for key, val in flat.items():
        bv = _bv_npz_key(key)
        if bv is not None:
            npz[bv] = np.asarray(val)
    src = tmp_path / "pali.npz"
    np.savez(src, **npz)

    env = {**os.environ, "JAX_PLATFORMS": "cpu", "LAP_TPU_MESH_PLATFORM": "cpu"}
    env.pop("PALLAS_AXON_POOL_IPS", None)
    dest = tmp_path / "converted"
    out = subprocess.run(
        [
            sys.executable, "scripts/convert_weights.py",
            "--config", "debug", "--kind", "paligemma",
            "--src", str(src), "--dest", str(dest),
        ],
        cwd=Path(__file__).resolve().parent.parent,
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert (dest / "params").exists()

    policy = policy_config.create_trained_policy(
        train_config, dest, allow_test_vocab=True, num_steps=2
    )
    # The exported VLM embedding flowed through (values conserved).
    restored = flatten(policy._params["params"])
    want = flat["llm/embedder/input_embedding"]
    np.testing.assert_allclose(
        np.asarray(restored["llm/embedder/input_embedding"], np.float32),
        np.asarray(want, np.float32),
        rtol=1e-6,
    )
    img = np.random.default_rng(0).integers(0, 255, (56, 56, 3), np.uint8)
    obs = {
        "observation": {
            "base_0_rgb": img,
            "left_wrist_0_rgb": img,
            "state": np.zeros(7, np.float32),
        },
        "prompt": "pick up the cup",
    }
    result = policy.infer(obs)
    assert np.isfinite(result["actions"]).all()
