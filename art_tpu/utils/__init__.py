from art_tpu.utils import ppm, images, metrics

__all__ = ["ppm", "images", "metrics"]
