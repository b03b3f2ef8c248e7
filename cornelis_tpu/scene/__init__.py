from .compile import SceneArrays, compile_scene
from .description import (
    MaterialDescription,
    PerspectiveCameraDescription,
    PlaneDescription,
    SceneDescription,
    SphereDescription,
)
from .library import BUILTIN_SCENES, cornell_box, sphere_on_plane

__all__ = [
    "BUILTIN_SCENES",
    "MaterialDescription",
    "PerspectiveCameraDescription",
    "PlaneDescription",
    "SceneArrays",
    "SceneDescription",
    "SphereDescription",
    "compile_scene",
    "cornell_box",
    "sphere_on_plane",
]
