from . import color, tiles, vec
from .vec import RGB, Basis, Vec3, construct_basis, cross, dot, mag2, normalize

__all__ = ["RGB", "Basis", "Vec3", "color", "construct_basis", "cross", "dot", "mag2", "normalize", "tiles", "vec"]
