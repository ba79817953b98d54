"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real TPU hardware is single-chip in CI; sharding/collective tests use XLA's
host-platform device virtualization instead.
"""

import os

# Force CPU: the session environment presets JAX_PLATFORMS=axon (remote TPU
# tunnel with high per-op dispatch latency); tests must run on the local
# virtual-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# Per-op XLA compiles are slow in this environment (~0.5s each); a persistent
# cache makes re-runs fast.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The environment's sitecustomize registers an 'axon' PJRT plugin (remote TPU
# tunnel) in every interpreter; initializing it can block on the tunnel even
# when tests only want CPU. Deregister it before any backend initialization.
try:
    import jax as _jax
    from jax._src import xla_bridge as _xb

    _xb._backend_factories.pop("axon", None)
    # jax may already be imported (sitecustomize registered the plugin with
    # JAX_PLATFORMS=axon baked into the config) — override the live config.
    _jax.config.update("jax_platforms", "cpu")
except Exception:
    pass
