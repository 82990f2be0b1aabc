from art_tpu.ops import perlin, texture_eval, intersect, shade

__all__ = ["perlin", "texture_eval", "intersect", "shade"]
