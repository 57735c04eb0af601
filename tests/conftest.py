"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding logic is validated on host CPU devices
(xla_force_host_platform_device_count) so tests never need real TPU pods;
the driver separately dry-runs the multichip path via __graft_entry__.py.

Note: this environment pre-imports jax via sitecustomize, so the platform
must be forced through jax.config (env vars alone are too late).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
