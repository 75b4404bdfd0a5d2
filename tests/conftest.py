"""Test configuration: force the CPU backend with 8 virtual devices.

The driver validates multi-chip sharding the same way
(``xla_force_host_platform_device_count``); real-TPU benchmarking lives in
``bench.py``, not the test suite.  Note: the environment pins
``JAX_PLATFORMS=axon`` (the TPU tunnel) and the plugin wins over env vars, so
we must use ``jax.config.update`` before any computation.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
# In-process CLI calls would otherwise enable the persistent compilation
# cache at its ~/.cache default mid-suite (order-dependent global state);
# the cache has its own tests (test_compile_cache.py) which override this.
os.environ.setdefault("YF_COMPILE_CACHE", "off")

import jax

jax.config.update("jax_platforms", "cpu")
