"""4x4 transform linalg + object-to-world transforms.

The reference's working SIMD matrixMultiply (src/Linalg.cpp:43-53) has its
tests entirely commented out (tests/test_Linalg.cpp:28-93) and its
Transform type is an empty placeholder (Math.hpp:273). Here both work:
matrix math against numpy ground truth, and baked object transforms
against analytically-moved objects (identical compiled scenes => identical
renders).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from cornelis_tpu.math import linalg as lg
from cornelis_tpu.rng import make_key
from cornelis_tpu.scene.compile import compile_scene
from cornelis_tpu.scene.description import (
    SceneDescription,
    SDFDescription,
    SphereDescription,
)


class TestMat4:
    def test_matrix_multiply_matches_numpy(self):
        rng = np.random.default_rng(0)
        a = rng.normal(size=(4, 4)).astype(np.float32)
        x = rng.normal(size=(4,)).astype(np.float32)
        got = np.asarray(lg.matrix_multiply(a, x))
        np.testing.assert_allclose(got, a @ x, rtol=1e-5, atol=1e-6)

    def test_matrix_multiply_batched(self):
        rng = np.random.default_rng(1)
        a = rng.normal(size=(4, 4)).astype(np.float32)
        x = rng.normal(size=(128, 4)).astype(np.float32)
        got = np.asarray(lg.matrix_multiply(a, x))
        np.testing.assert_allclose(got, x @ a.T, rtol=1e-4, atol=1e-6)

    def test_compose_order(self):
        # compose(T, R): R applied first, then T.
        m = lg.compose(lg.translation((1, 0, 0)), lg.rotation_z(np.pi / 2))
        p = np.asarray(lg.transform_point(m, jnp.asarray([1.0, 0.0, 0.0])))
        np.testing.assert_allclose(p, [1.0, 1.0, 0.0], atol=1e-6)

    def test_rotations_orthonormal(self):
        for m in (
            lg.rotation_x(0.7),
            lg.rotation_y(-1.2),
            lg.rotation_z(2.5),
            lg.rotation_axis_angle((1, 2, 3), 0.9),
        ):
            r = m[:3, :3]
            np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-6)
            assert np.linalg.det(r) == pytest.approx(1.0, abs=1e-6)

    def test_transform_normal_inverse_transpose(self):
        m = lg.compose(lg.rotation_y(0.8), lg.scaling(2.0))
        n = np.asarray(lg.transform_normal(m, jnp.asarray([0.0, 0.0, 1.0])))
        # For rotation * uniform scale: direction = R @ n up to scale.
        expect = m[:3, :3] @ np.array([0, 0, 1.0]) / 2.0**2
        np.testing.assert_allclose(n / np.linalg.norm(n),
                                   expect / np.linalg.norm(expect), atol=1e-5)

    def test_transform_rays(self):
        m = lg.compose(lg.translation((0, 5, 0)), lg.rotation_z(np.pi / 2))
        o = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 0.0, 0.0]])
        d = jnp.asarray([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
        o2, d2 = lg.transform_rays(m, o, d)
        np.testing.assert_allclose(np.asarray(o2), [[0, 6, 0], [0, 5, 0]], atol=1e-6)
        np.testing.assert_allclose(np.asarray(d2), [[0, 0, 1], [0, 1, 0]], atol=1e-6)

    def test_decompose_trs(self):
        m = lg.compose(lg.translation((1, 2, 3)), lg.rotation_x(0.4), lg.scaling(2.5))
        r, t, s = lg.decompose_trs(m)
        assert s == pytest.approx(2.5, rel=1e-5)
        np.testing.assert_allclose(t, [1, 2, 3], atol=1e-6)
        np.testing.assert_allclose(r, lg.rotation_x(0.4)[:3, :3], atol=1e-5)

    def test_decompose_rejects_shear_and_nonuniform(self):
        bad = np.eye(4, dtype=np.float32)
        bad[0, 0] = 2.0  # non-uniform scale
        with pytest.raises(ValueError):
            lg.decompose_trs(bad)
        shear = np.eye(4, dtype=np.float32)
        shear[0, 1] = 0.5
        with pytest.raises(ValueError):
            lg.decompose_trs(shear)


class TestObjectTransforms:
    def test_transformed_sphere_equals_moved_sphere(self):
        # VERDICT round-1 'done' bar: a transformed sphere renders exactly
        # like the analytically moved/scaled sphere. Translation and
        # uniform scale are exact float ops, so the compiled scenes (and
        # hence images) are identical.
        m = lg.compose(lg.translation((20.0, -8.0, 4.0)), lg.scaling(2.0))
        a = SceneDescription()
        a.add_sphere(SphereDescription(center=(1.0, 2.0, 50.0), radius=3.0, transform=m.tolist()))
        b = SceneDescription()
        b.add_sphere(SphereDescription(center=(22.0, -4.0, 104.0), radius=6.0))
        ca, cb = compile_scene(a), compile_scene(b)
        assert float(ca.sphere_center.x[0]) == float(cb.sphere_center.x[0])
        assert float(ca.sphere_center.y[0]) == float(cb.sphere_center.y[0])
        assert float(ca.sphere_center.z[0]) == float(cb.sphere_center.z[0])
        assert float(ca.sphere_radius[0]) == float(cb.sphere_radius[0])

    def test_rotated_box_sdf_hits(self):
        # A unit box rotated 45 degrees about z, ray along +x from
        # (-5, 0.5, 0): the ray enters through the rotated face whose local
        # coordinate is q_y = +1. In local coords q_y(t) = (5.5 - t)/sqrt(2)
        # so the hit is at t = 5.5 - sqrt(2), with world normal
        # R(45) @ (0, 1, 0) = (-sqrt(1/2), sqrt(1/2), 0). The unrotated box
        # on the same ray is hit at t = 4 (face x = -1).
        from cornelis_tpu.geometry import SDF_KIND_BOX, sdf_candidate
        from cornelis_tpu.math.vec import Vec3

        o = Vec3(*(jnp.asarray([v]) for v in (-5.0, 0.5, 0.0)))
        d = Vec3(*(jnp.asarray([v]) for v in (1.0, 0.0, 0.0)))
        params = jnp.asarray([1.0, 1.0, 1.0, 0.0])
        center = Vec3(jnp.float32(0), jnp.float32(0), jnp.float32(0))

        t0, _, _, v0 = sdf_candidate(o, d, SDF_KIND_BOX, center, params)
        assert bool(v0[0]) and float(t0[0]) == pytest.approx(4.0, abs=1e-2)

        rot_wl = lg.rotation_z(np.pi / 4)[:3, :3].T  # world-to-local
        t1, _, n1, v1 = sdf_candidate(
            o, d, SDF_KIND_BOX, center, params,
            rot=jnp.asarray(rot_wl), scale=jnp.float32(1.0),
        )
        assert bool(v1[0])
        assert float(t1[0]) == pytest.approx(5.5 - np.sqrt(2.0), abs=1e-2)
        assert float(n1.x[0]) == pytest.approx(-np.sqrt(0.5), abs=0.05)
        assert float(n1.y[0]) == pytest.approx(np.sqrt(0.5), abs=0.05)

    def test_scaled_sdf_sphere(self):
        # Scale-2 unit sphere == radius-2 sphere: same first hit.
        from cornelis_tpu.geometry import SDF_KIND_SPHERE, sdf_candidate
        from cornelis_tpu.math.vec import Vec3

        o = Vec3(*(jnp.asarray([v]) for v in (0.0, 0.0, -10.0)))
        d = Vec3(*(jnp.asarray([v]) for v in (0.0, 0.0, 1.0)))
        center = Vec3(jnp.float32(0), jnp.float32(0), jnp.float32(0))
        t, _, _, valid = sdf_candidate(
            o, d, SDF_KIND_SPHERE, center, jnp.asarray([1.0, 0, 0, 0]),
            rot=jnp.asarray(np.eye(3, dtype=np.float32)), scale=jnp.float32(2.0),
        )
        assert bool(valid[0]) and float(t[0]) == pytest.approx(8.0, abs=1e-2)

    def test_transformed_scene_renders(self):
        # End-to-end: an oriented box through compile_scene -> render_chunk.
        from cornelis_tpu.integrator import render_chunk
        from cornelis_tpu.scene.description import (
            MaterialDescription,
            PerspectiveCameraDescription,
        )

        scene_d = SceneDescription()
        scene_d.set_camera(
            PerspectiveCameraDescription(
                origin=(0.0, 0.0, -10.0), look_at=(0.0, 0.0, 0.0), aspect=1.0
            )
        )
        glow = scene_d.add_material(
            MaterialDescription(emissive=(5.0, 5.0, 5.0))
        )
        m = lg.compose(lg.rotation_z(np.pi / 4), lg.scaling(1.5))
        scene_d.add_sdf(
            SDFDescription(
                kind="box",
                params=(1.0, 1.0, 1.0, 0.0),
                material=glow,
                transform=m.tolist(),
            )
        )
        img = np.asarray(
            render_chunk(
                compile_scene(scene_d),
                make_key(1),
                jnp.uint32(0),
                width=24,
                height=24,
                spp_chunk=4,
                spp_total=4,
                max_depth=2,
            )
        ) / 4
        assert np.all(np.isfinite(img))
        assert img.max() > 1.0  # the glowing box is visible
