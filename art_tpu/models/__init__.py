from art_tpu.models.scenes import SCENES, build_scene, scene_defaults

__all__ = ["SCENES", "build_scene", "scene_defaults"]
