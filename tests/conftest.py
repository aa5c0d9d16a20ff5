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
    # 12 fake devices but an 8-device default mesh (DRAY_MESH_DEVICE_CAP,
    # honored by parallel.mesh.make_mesh): the XLA:CPU client's execution
    # threads scale with the device count, and a shard_map'd Pallas
    # interpret program whose mesh occupies ALL host devices can starve —
    # in-kernel DMA waits need a spare execution thread to make progress.
    # Root-caused round 5 with a 100%-reproducible wedge: an 8-device
    # mega-walk render deadlocked every run on 8 fake devices (all threads
    # futex_wait, CPU time frozen) and passed in 7 s on 16; 7-of-8 also
    # passed.  This was the round-2..4 "intermittent full-suite compile
    # deadlock" (CLAUDE.md) — mesh tests occupied every device thread.
    os.environ["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count=12 "
        + os.environ.get("XLA_FLAGS", "")
    )
    os.environ.setdefault("DRAY_MESH_DEVICE_CAP", "8")

    import jax  # noqa: E402

    jax.config.update("jax_platforms", "cpu")
