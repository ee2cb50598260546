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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
