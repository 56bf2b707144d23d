from ihmr_tpu.ops.collision import collision_loss, penetration_depth, point_triangle_closest  # noqa: F401
