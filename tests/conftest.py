"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated without TPU hardware via
``--xla_force_host_platform_device_count`` (the strategy SURVEY.md §4 calls
out as the piece the reference never needed).

Note: this environment's sitecustomize registers a tunneled TPU backend and
force-sets ``jax_platforms`` programmatically, so the env var alone is not
enough — we override the config again after importing jax."""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite compiles hundreds of programs
# (shape buckets x capacities); caching them on disk cuts reruns from
# ~30 min to minutes and works around an XLA-CPU compiler segfault seen
# after very many in-process compilations.
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
