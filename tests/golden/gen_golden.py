"""Generate the golden sample_actions fixture (run on the CPU mesh env):

    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python tests/golden/gen_golden.py

The fixture pins f32 CPU numerics of the full inference path (prefill +
10-step flow decode) for the tiny flagship-architecture model, so any
numerics drift across rounds fails tests/test_golden_parity.py.
"""

from pathlib import Path

import jax
import numpy as np

import sys

sys.path.insert(0, str(Path(__file__).parent.parent))

from test_golden_parity import _golden_inputs, _tiny_model  # noqa: E402

cfg, model, params = _tiny_model()
obs, noise = _golden_inputs(cfg)
actions = model.apply(
    params, jax.random.PRNGKey(7), obs, num_steps=10, noise=noise,
    method=model.sample_actions,
)
out = Path(__file__).parent / "sample_actions_tiny.npz"
np.savez(out, actions=np.asarray(actions, np.float32))
print("wrote", out, np.asarray(actions).shape, float(np.abs(actions).sum()))
