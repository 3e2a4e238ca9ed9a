import os

# Tests run on a virtual multi-device CPU mesh so sharding paths (psum,
# batch sharding, fsdp partitioning) are exercised without TPU hardware
# (SURVEY.md §4 implication). 2 virtual devices, not 8: every XLA CPU
# collective needs all device threads to rendezvous concurrently, and on a
# 1-core CI host an 8-way rendezvous intermittently times out and SIGABRTs
# under load (observed rendezvous.cc hangs). The driver's dryrun_multichip
# still validates the full 8-device mesh with its own XLA_FLAGS.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2"
    ).strip()

# Exported so SPAWNED children (server train jobs, subprocess CLI tests)
# also land on CPU — joligen_tpu.__init__._respect_platform_env applies it
# at config level in every child even though sitecustomize force-selects
# the TPU plugin after env parsing.
os.environ["JAX_PLATFORMS"] = "cpu"

# The machine's sitecustomize force-selects the axon TPU platform
# (jax_platforms="axon,cpu") even when JAX_PLATFORMS=cpu is exported, so the
# override must happen at the config level after import.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
