"""Test harness: force an 8-device virtual CPU mesh.

Multi-chip sharding logic (FSDP/TP layouts, collectives, batch divisibility)
is validated on host CPU with ``xla_force_host_platform_device_count``, per
the test strategy in SURVEY.md §4.

The ambient environment may register a real-TPU PJRT plugin at interpreter
startup (sitecustomize) which cannot be unregistered; the CPU backend still
coexists with it, so we (a) request 8 virtual CPU devices, (b) point the
default device at CPU, and (c) tell lap_tpu mesh construction to build
meshes from the CPU platform.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# If no TPU plugin was force-registered, run fully on CPU.
if not os.environ.get("PALLAS_AXON_POOL_IPS"):
    os.environ["JAX_PLATFORMS"] = "cpu"
# Meshes in lap_tpu build from this platform's devices.
os.environ["LAP_TPU_MESH_PLATFORM"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_threefry_partitionable", True)
jax.config.update("jax_default_device", jax.devices("cpu")[0])
# Make CPU the *default backend* even when a TPU plugin is registered, so
# jax.default_backend() == "cpu" and Pallas kernels pick interpret mode.
jax.config.update("jax_platform_name", "cpu")

# Isolate the persistent XLA compilation cache per test session. The CLI
# entrypoints (train/eval/serve) enable ~/.cache/lap_tpu/xla by default —
# test_eval_script runs eval.main IN-PROCESS (turning the cache on for the
# rest of the session) and the serve-CLI tests SIGKILL server subprocesses,
# which can tear a cache write mid-file; a corrupted entry ABORTS (SIGABRT,
# not an exception) whichever later process deserializes it. A throwaway
# per-session dir keeps torn writes away from the user cache and from
# concurrent sessions.
if "LAP_TPU_COMPILATION_CACHE" not in os.environ:
    import tempfile

    os.environ["LAP_TPU_COMPILATION_CACHE"] = tempfile.mkdtemp(
        prefix="lap_tpu_xla_cache_"
    )

import psutil  # noqa: E402
import pytest  # noqa: E402

_PROC = psutil.Process()
_RSS_CLEAR_BYTES = 5 * 2**30


@pytest.fixture(autouse=True)
def _bound_compiled_code_growth():
    """XLA:CPU segfaults once the volume of live compiled executables in one
    process grows past a threshold: the full ~670-test suite crashed
    DETERMINISTICALLY in its largest SPMD compile (test_tensor_parallel)
    while any half of the suite passes, and the same compile succeeds in
    isolation — pure accumulation, no specific interaction (bisected
    2026-08-18). Dropping the jit caches when RSS crosses 5 GiB bounds the
    accumulation; later tests transparently recompile."""
    if _PROC.memory_info().rss > _RSS_CLEAR_BYTES:
        jax.clear_caches()
    yield
