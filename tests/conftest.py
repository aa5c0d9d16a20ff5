"""Test harness config: force the CPU backend with 8 virtual devices.

Multi-chip sharding tests run on a fake 8-device CPU mesh (the fake-backend
trick the reference lacks — its "distributed" tests are 56 tokio tasks on
loopback, run_server.rs:23-51, eyeballed via minifb windows).

NOTE: the axon sitecustomize force-sets jax_platforms="axon,cpu", so the
JAX_PLATFORMS env var alone is not enough; we must update jax.config before
any backend is initialized.
"""

import os

if os.environ.get("DRAY_TPU_TESTS"):
    # hardware tier (`pytest -m tpu`, scripts/run_tpu_tests.sh): keep the
    # real backend; the CPU-only tests are deselected by the marker
    import jax  # noqa: F401
else:
    os.environ["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count=8 "
        + os.environ.get("XLA_FLAGS", "")
    )

    import jax  # noqa: E402

    jax.config.update("jax_platforms", "cpu")
