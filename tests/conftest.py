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
    # 12 fake devices; default meshes span ALL of them.  Two wedge
    # classes were root-caused round 5 (docs/DESIGN.md §18), with
    # OPPOSITE device-layout preferences, both deterministic at their
    # trigger shapes (all threads futex_wait, CPU time frozen — the
    # rounds-2..4 "intermittent full-suite compile deadlock"):
    #   - shard_map'd Pallas-interpret kernels with in-kernel DMA waits
    #     (the walk engines) starve when their mesh occupies EVERY host
    #     device (8-of-8 wedges 3/3; 7-of-8 and 8-of-12+ pass) — such
    #     tests must pin an explicit PROPER-SUBSET mesh
    #     (test_mega_walk_tape uses n_rays=8 of 12);
    #   - large NON-DMA interpret programs (the camera tape tracer under
    #     shard_map) wedge on a proper-SUBSET mesh (8-of-12 wedges 3/3;
    #     8-of-8 and 12-of-12 pass) — the DEFAULT mesh therefore spans
    #     all devices, like rounds 2-4.
    os.environ["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count=12 "
        + os.environ.get("XLA_FLAGS", "")
    )

    import jax  # noqa: E402

    jax.config.update("jax_platforms", "cpu")
