"""Perspective camera: lookAt construction and vectorized ray generation.

Reproduces the reference camera exactly (src/Camera.cpp:7-39), including its
two quirks, both of which bias the rendered image and so are required for
golden matching:
  * u = up x dir is NOT re-normalized, so the FOV skews when dir is not
    perpendicular to up (Camera.cpp:20).
  * the aspect ratio multiplies the *vertical* axis v (Camera.cpp:25).
Camera space: +Z toward the subject, negative X points left (Camera.hpp:10).

Ray generation is a single vectorized op over normalized framebuffer
coordinates: the reference's per-sample `cam(x, y)` call (Camera.cpp:11-13)
becomes one fused multiply-add + normalize over the whole wavefront.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax.numpy as jnp

from .math.vec import Vec3, cross, normalize_unchecked, vec3

Array = jnp.ndarray


class Camera(NamedTuple):
    """Compiled perspective camera: eye + image-plane frame (Camera.hpp:15-52).

    All components are scalar-shaped Vec3s; the pytree is traceable so camera
    parameters can receive gradients in differentiable mode.
    """

    eye: Vec3
    corner: Vec3
    u: Vec3
    v: Vec3


# sin(0.5): the default camera's 1-radian horizontal FOV constant
# (Camera.cpp:7-9).
_SIN_HALF = 0.4794255386


def default_camera() -> Camera:
    """Default-constructed camera (Camera.cpp:7-9)."""
    return Camera(
        eye=vec3(0.0, 0.0, 0.0),
        corner=vec3(-_SIN_HALF, -_SIN_HALF, 1.0),
        u=vec3(2 * _SIN_HALF, 0.0, 0.0),
        v=vec3(0.0, 2 * _SIN_HALF, 0.0),
    )


def look_at(origin, target, aspect, horizontal_fov) -> Camera:
    """Build a camera from origin/target (Camera.cpp:15-34).

    up is fixed (0,1,0); fovScale = 2 sin(hFov/2); the image plane frame is
    u = (up x dir) * fovScale (unnormalized -- reference quirk) and
    v = (u x dir) * aspect * fovScale; corner = dir - u/2 - v/2.
    """
    o = vec3(*origin) if not isinstance(origin, Vec3) else origin
    t = vec3(*target) if not isinstance(target, Vec3) else target
    up = vec3(0.0, 1.0, 0.0)

    direction = normalize_unchecked(t - o)
    u = cross(up, direction)
    v = cross(u, direction)

    fov_scale = 2.0 * jnp.sin(horizontal_fov * 0.5)
    u = u * fov_scale
    v = v * (aspect * fov_scale)

    corner = direction - u * 0.5 - v * 0.5
    return Camera(eye=o, corner=corner, u=u, v=v)


def look_at_host(origin, target, aspect, horizontal_fov) -> Camera:
    """`look_at` computed entirely in host numpy float32.

    Scene compilation uses this (scene/compile.py) so the compiled camera is
    bit-identical no matter which jax backend is active: the Pallas
    megakernel bakes these numbers in as compile-time literals
    (ops/pallas_integrator.py builds its tables on the CPU backend), and the
    XLA path reads them from the SceneArrays pytree -- if the two were
    derived on different silicon they could differ at ulp level and the
    "same scene" would render through different constants (advisor finding,
    round 2). Same math and quirks as `look_at` (Camera.cpp:15-34).
    """
    import numpy as np

    f32 = np.float32
    o = np.asarray(origin, f32)
    t = np.asarray(target, f32)
    up = np.asarray([0.0, 1.0, 0.0], f32)

    d = (t - o).astype(f32)
    d = (d * f32(1.0 / np.sqrt(f32(d @ d)))).astype(f32)
    u = np.cross(up, d).astype(f32)
    v = np.cross(u, d).astype(f32)

    fov_scale = f32(2.0) * f32(np.sin(f32(horizontal_fov) * f32(0.5)))
    u = (u * fov_scale).astype(f32)
    v = (v * (f32(aspect) * fov_scale)).astype(f32)
    corner = (d - u * f32(0.5) - v * f32(0.5)).astype(f32)

    mk = lambda a: vec3(float(a[0]), float(a[1]), float(a[2]))
    return Camera(eye=mk(o), corner=mk(corner), u=mk(u), v=mk(v))


def horizontal_fov_35mm(focal_length: float) -> float:
    """Horizontal FOV of a 35mm-frame lens (Camera.cpp:36-39)."""
    if focal_length <= 0.0:
        raise ValueError("Does not support zero or negative focal lengths.")
    return 2.0 * math.atan(36.0 / (2.0 * focal_length))


def generate_rays(cam: Camera, x: Array, y: Array) -> Tuple[Vec3, Vec3]:
    """World rays through normalized framebuffer coords (Camera.cpp:11-13).

    x, y: arrays of any (matching) shape in [0, 1). Returns (origins, dirs);
    dirs normalized with the camera's epsilon-free normalize (nanovdb
    Vec3::normalize semantics).
    """
    d = Vec3(
        cam.corner.x + x * cam.u.x + y * cam.v.x,
        cam.corner.y + x * cam.u.y + y * cam.v.y,
        cam.corner.z + x * cam.u.z + y * cam.v.z,
    )
    d = normalize_unchecked(d)
    o = Vec3(
        jnp.broadcast_to(cam.eye.x, d.x.shape),
        jnp.broadcast_to(cam.eye.y, d.y.shape),
        jnp.broadcast_to(cam.eye.z, d.z.shape),
    )
    return o, d
