from distributed_raytracer_tpu.grad.diff_render import (  # noqa: F401
    render_diff,
    image_loss,
    scene_and_camera_grads,
    scene_grads,
    InverseRenderer,
)
from distributed_raytracer_tpu.grad.pathgrad import (  # noqa: F401
    make_image_grad_fn,
    make_pathgrad_tracer,
)
