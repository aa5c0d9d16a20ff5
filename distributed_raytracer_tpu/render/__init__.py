from distributed_raytracer_tpu.render import image, progressive, renderer  # noqa: F401
