from art_tpu.core import vecmath, rng, camera

__all__ = ["vecmath", "rng", "camera"]
