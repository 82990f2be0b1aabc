from art_tpu.utils import ppm, images

__all__ = ["ppm", "images"]
