from distributed_raytracer_tpu.core import vecmath, rng  # noqa: F401
