from distributed_raytracer_tpu.ops import camera, intersect, materials, trace  # noqa: F401
