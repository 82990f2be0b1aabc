from art_tpu.render.integrator import trace
from art_tpu.render.renderer import render_scene, RenderConfig

__all__ = ["trace", "render_scene", "RenderConfig"]
