import os

# Tests run on a virtual 8-device CPU mesh so sharding paths are exercised
# without TPU hardware (SURVEY.md §4 implication).
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The machine's sitecustomize force-selects the axon TPU platform
# (jax_platforms="axon,cpu") even when JAX_PLATFORMS=cpu is exported, so the
# override must happen at the config level after import.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
