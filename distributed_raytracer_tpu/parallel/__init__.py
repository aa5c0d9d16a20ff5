from distributed_raytracer_tpu.parallel.mesh import (  # noqa: F401
    RAYS_AXIS,
    SCENE_AXIS,
    make_mesh,
    ray_sharding,
    replicated,
    scene_sharding,
)
from distributed_raytracer_tpu.parallel.sharded import (  # noqa: F401
    ShardedRenderer,
    make_fused_dp_render,
    make_mega_dp_render,
    make_mega_walk_dp_render,
    make_sharded_grad_fn,
    make_tape_camera_dp_tracer,
    make_tape_camera_walk_dp_tracer,
    make_tape_dp_tracer,
)
from distributed_raytracer_tpu.parallel.scene_sharded import (  # noqa: F401
    closest_hit_sharded,
    make_scene_sharded_grad_fn,
    make_scene_sharded_render,
    shard_scene,
    trace_rays_sharded,
)
