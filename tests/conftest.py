"""Test harness: force an 8-virtual-device CPU platform.

Multi-chip hardware is unavailable in CI; sharding tests run on a virtual
8-device CPU mesh exactly like the driver's dryrun_multichip check.

NOTE: the environment's "axon" TPU plugin force-prepends itself to
``jax_platforms`` at import, ignoring ``JAX_PLATFORMS`` — without the explicit
``jax.config.update`` every eager op (including trace-time constant folding)
round-trips the TPU tunnel at ~20 ms each, making tests minutes-slow.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
