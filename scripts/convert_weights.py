"""Convert pretrained weight exports into a ready-to-serve params checkpoint.

The reference only exercises its weight remappers inside the trainer
(weight_loaders are constructed from the train config); this CLI exposes the
same remapping standalone, so a user can turn a big_vision PaliGemma ``.npz``
or a raw per-layer Gemma3-IT orbax export into a ``{dest}/params`` directory
that ``create_trained_policy`` / ``serve_policy.py --checkpoint_dir`` loads
directly.

Model parameters the export does not cover (the action expert, projections,
time MLP, ...) are seeded from the config's standard initialization with
``--seed``, exactly like a fresh training run that starts from the same
export — so a converted checkpoint serves the same outputs that a step-0
training run would produce.

Usage:
    python scripts/convert_weights.py --config lap \\
        --kind paligemma --src pali.npz --dest ckpts/converted
    python scripts/convert_weights.py --config lap_gemma3_4b \\
        --kind gemma3 --src gemma3-4b-it/ --dest ckpts/g3
"""

from __future__ import annotations

import pathlib as _pathlib
import sys as _sys

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parents[1]))

import argparse
import logging
from pathlib import Path

logger = logging.getLogger(__name__)


def main():
    logging.basicConfig(level=logging.INFO)
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True, help="named train config")
    parser.add_argument(
        "--kind", required=True,
        choices=["checkpoint", "paligemma", "paligemma2", "gemma3"],
    )
    parser.add_argument("--src", required=True, help="export path (.npz / dir)")
    parser.add_argument("--dest", required=True, help="output checkpoint dir")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    import jax
    import orbax.checkpoint as ocp

    from lap_tpu.training import config as config_mod
    from lap_tpu.training.weight_loaders import WeightLoaderChoice

    dest = Path(args.dest).resolve()
    if (dest / "params").exists():
        raise SystemExit(f"{dest / 'params'} already exists; refusing to overwrite")

    train_config = config_mod.get_config(args.config)
    model = train_config.model.create_module()
    rng = jax.random.PRNGKey(args.seed)
    params = model.init(rng, rng, method=model.init_params_fn)["params"]
    params_shape = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params
    )

    loader = WeightLoaderChoice(kind=args.kind, params_path=args.src).build()
    loaded = loader.load(params_shape)

    n_loaded = 0

    def place(new, cur):
        nonlocal n_loaded
        if isinstance(new, jax.ShapeDtypeStruct):
            return cur  # not covered by the export: fresh init
        n_loaded += 1
        return jax.numpy.asarray(new, dtype=cur.dtype)

    merged = jax.tree.map(place, loaded, params)
    total = len(jax.tree.leaves(params))
    logger.info("export covered %d/%d model params", n_loaded, total)
    if n_loaded == 0:
        raise SystemExit("export covered no model parameters; wrong --config/--kind?")

    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(dest / "params", {"params": merged})
    print(f"wrote {dest / 'params'} ({n_loaded}/{total} params from {args.src})")


if __name__ == "__main__":
    main()
