from art_tpu.parallel.sharding import make_mesh, render_scene_sharded, sharded_render_step

__all__ = ["make_mesh", "render_scene_sharded", "sharded_render_step"]
