import os
import sys

# Force an 8-device CPU mesh for all tests: multi-chip sharding is validated
# on virtual devices (the standard JAX substitute for a TPU pod in CI).
# Note: the axon sitecustomize registers the TPU backend at interpreter
# startup, so env vars alone don't stick — switch platforms programmatically.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: the fast suite is dominated by XLA CPU
# compiles of full-model graphs; warm-cache reruns skip them entirely.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
