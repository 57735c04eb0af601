"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding logic is validated on host CPU devices
(xla_force_host_platform_device_count) so tests never need real TPU pods;
the driver separately dry-runs the multichip path via __graft_entry__.py.

Note: this environment pre-imports jax via sitecustomize, so the platform
must be forced through jax.config (env vars alone are too late).
"""

import os

_TPU_GATES = os.environ.get("RUVECTOR_PERF_GATES") == "tpu"
if not _TPU_GATES:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )

import jax  # noqa: E402

# TPU perf gates opt out of the CPU force (run them alone:
# RUVECTOR_PERF_GATES=tpu pytest tests/test_perf_gates.py)
if not _TPU_GATES:
    jax.config.update("jax_platforms", "cpu")
    # highest matmul precision forces fp32 contract precision into bf16
    # Pallas matmuls, which Mosaic rejects ("Bad lhs type") — only apply
    # it to the CPU parity runs it was meant for
    jax.config.update("jax_default_matmul_precision", "highest")
