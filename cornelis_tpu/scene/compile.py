"""Scene compilation: description (AoS, host) -> SceneArrays (SoA, device).

The reference compiles `SceneDescription` into `SceneData` -- SoA sphere and
plane tables plus a material vector (src/Scene.cpp:5-53, include/cornelis/
Scene.hpp:20-51). Here the compiled form is a pytree of stacked jnp arrays:
replicable across the device mesh, traceable (so scene parameters can be
optimized in the differentiable mode), and directly consumable by the
wavefront kernels.

Unlike the reference, virtual BRDF dispatch disappears: every material is a
StandardMaterial (emission + layered diffuse/glossy BRDF, Materials.hpp:
325-338), so the material table is a dense parameter array gathered by id.
Derived quantities (Burley roughness remaps, Oren-Nayar A/B terms) are
computed inside the shading kernels from the raw parameters so gradients
flow to `roughness` etc. in differentiable mode.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..camera import Camera, look_at_host
from ..math.vec import Vec3
from .description import SDF_KINDS, SceneDescription

Array = jnp.ndarray


class SceneArrays(NamedTuple):
    """Compiled scene: camera + stacked object/material tables.

    Sphere table mirrors SphereData {center, radius, material_id}
    (Scene.cpp:5-18); plane table mirrors PlaneData {point, normal, width,
    height, material_id} with extents.x -> width, extents.y -> height
    (Scene.cpp:20-38). Materials are the StandardMaterial parameter rows.
    """

    camera: Camera
    # Spheres: (S,)
    sphere_center: Vec3
    sphere_radius: Array
    sphere_material: Array
    # Planes: (P,)
    plane_normal: Vec3
    plane_point: Vec3
    plane_width: Array
    plane_height: Array
    plane_material: Array
    # Implicit (SDF / level-set) surfaces: (K,) + (K, 4) params
    # (sphere-traced; our NanoVDB-level-set stand-in, SURVEY §2 #18).
    # sdf_rot is the world-to-local rotation (K, 3, 3) and sdf_scale the
    # uniform object scale -- baked from the optional object transform
    # (identity / 1.0 by default); they make boxes and tori orientable.
    sdf_kind: Array
    sdf_center: Vec3
    sdf_params: Array
    sdf_material: Array
    sdf_rot: Array
    sdf_scale: Array
    # Materials: (M,)
    mat_albedo: Vec3
    mat_emission: Vec3
    mat_tint: Vec3
    mat_roughness: Array
    mat_ior: Array

    @property
    def num_spheres(self) -> int:
        return self.sphere_radius.shape[0]

    @property
    def num_planes(self) -> int:
        return self.plane_width.shape[0]

    @property
    def num_sdfs(self) -> int:
        return self.sdf_kind.shape[0]

    @property
    def num_materials(self) -> int:
        return self.mat_roughness.shape[0]


def _stack_vec3(values, dtype=jnp.float32) -> Vec3:
    xs = jnp.asarray([v[0] for v in values], dtype)
    ys = jnp.asarray([v[1] for v in values], dtype)
    zs = jnp.asarray([v[2] for v in values], dtype)
    return Vec3(xs, ys, zs)


def compile_scene(descr: SceneDescription) -> SceneArrays:
    """Pure function description -> device arrays (Scene.cpp:40-53 analog).

    Material resolution: objects with material=None use index 0 (the default
    material the builder always installs), matching `value_or(0)` at
    Scene.cpp:16,36.
    """
    # Host numpy camera math: compiled tables are bit-identical on every
    # backend, so the Pallas kernel's baked constants (built via the CPU
    # backend) and the XLA path's device arrays always agree exactly
    # (see camera.look_at_host).
    cam = look_at_host(
        descr.camera.origin,
        descr.camera.look_at,
        descr.camera.aspect,
        descr.camera.horizontal_fov,
    )

    import numpy as np

    from ..math.linalg import decompose_trs

    def trs(obj):
        """(R, t, s) of the object's optional transform (identity default)."""
        if obj.transform is None:
            return np.eye(3, dtype=np.float32), np.zeros(3, np.float32), 1.0
        return decompose_trs(obj.transform)

    def apply_pt(r, t, s, p):
        return tuple((s * (r @ np.asarray(p, np.float32)) + t).tolist())

    spheres = descr.spheres
    sphere_trs = [trs(s) for s in spheres]
    sphere_center = _stack_vec3(
        [apply_pt(r, t, s, sp.center) for (r, t, s), sp in zip(sphere_trs, spheres)]
    )
    sphere_radius = jnp.asarray(
        [s * sp.radius for (_, _, s), sp in zip(sphere_trs, spheres)], jnp.float32
    )
    sphere_material = jnp.asarray(
        [s.material if s.material is not None else 0 for s in spheres], jnp.int32
    )

    planes = descr.planes
    plane_trs = [trs(p) for p in planes]
    plane_normal = _stack_vec3(
        [tuple((r @ np.asarray(p.normal, np.float32)).tolist())
         for (r, _, _), p in zip(plane_trs, planes)]
    )
    plane_point = _stack_vec3(
        [apply_pt(r, t, s, p.point) for (r, t, s), p in zip(plane_trs, planes)]
    )
    plane_width = jnp.asarray(
        [s * p.extents[0] for (_, _, s), p in zip(plane_trs, planes)], jnp.float32
    )
    plane_height = jnp.asarray(
        [s * p.extents[1] for (_, _, s), p in zip(plane_trs, planes)], jnp.float32
    )
    plane_material = jnp.asarray(
        [p.material if p.material is not None else 0 for p in planes], jnp.int32
    )

    sdfs = descr.sdfs
    sdf_trs = [trs(s) for s in sdfs]
    sdf_kind = jnp.asarray([SDF_KINDS.index(s.kind) for s in sdfs], jnp.int32)
    sdf_center = _stack_vec3(
        [apply_pt(r, t, s, sd.center) for (r, t, s), sd in zip(sdf_trs, sdfs)]
    )
    sdf_params = jnp.asarray(
        [tuple(s.params) + (0.0,) * (4 - len(s.params)) for s in sdfs], jnp.float32
    ).reshape(len(sdfs), 4)
    sdf_material = jnp.asarray(
        [s.material if s.material is not None else 0 for s in sdfs], jnp.int32
    )
    # World-to-local rotation = R^T; the march rotates query points into the
    # object frame and scales distances back to world (geometry.py).
    sdf_rot = jnp.asarray(
        np.stack([r.T for (r, _, _) in sdf_trs], axis=0)
        if sdfs
        else np.zeros((0, 3, 3), np.float32),
        jnp.float32,
    )
    sdf_scale = jnp.asarray([s for (_, _, s) in sdf_trs], jnp.float32)

    mats = descr.materials
    if not mats:
        raise ValueError("Scene must have at least the default material at index 0.")

    return SceneArrays(
        camera=cam,
        sphere_center=sphere_center,
        sphere_radius=sphere_radius,
        sphere_material=sphere_material,
        plane_normal=plane_normal,
        plane_point=plane_point,
        plane_width=plane_width,
        plane_height=plane_height,
        plane_material=plane_material,
        sdf_kind=sdf_kind,
        sdf_center=sdf_center,
        sdf_params=sdf_params,
        sdf_material=sdf_material,
        sdf_rot=sdf_rot,
        sdf_scale=sdf_scale,
        mat_albedo=_stack_vec3([m.albedo for m in mats]),
        mat_emission=_stack_vec3([m.emissive for m in mats]),
        mat_tint=_stack_vec3([m.reflection_tint for m in mats]),
        mat_roughness=jnp.asarray([m.roughness for m in mats], jnp.float32),
        mat_ior=jnp.asarray([m.ior for m in mats], jnp.float32),
    )
