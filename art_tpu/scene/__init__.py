from art_tpu.scene.tables import SceneTables, MatType, TexType
from art_tpu.scene.builder import SceneBuilder, CompiledScene
from art_tpu.scene import objects, materials, textures

__all__ = [
    "SceneTables",
    "MatType",
    "TexType",
    "SceneBuilder",
    "CompiledScene",
    "objects",
    "materials",
    "textures",
]
