"""Dynamic-scene megakernel (ops/pallas_dynamic.py): the scene-as-operand
prototype. Parity against the XLA wavefront on bit-shared sobol draws,
the no-retrace property under scene edits, padding, and scope guards."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cornelis_tpu.integrator import render_chunk
from cornelis_tpu.ops.pallas_dynamic import (
    _build_renderer_dyn,
    render_chunk_pallas_dynamic,
)
from cornelis_tpu.rng import make_key
from cornelis_tpu.scene.compile import compile_scene
from cornelis_tpu.scene.library import (
    cornell_box,
    cornell_panel,
    sdf_gallery,
    sphere_grid,
)


KW = dict(width=24, height=24, spp_chunk=8, spp_total=8, max_depth=6,
          sampler="sobol")


class TestParity:
    @pytest.mark.parametrize("maker", [cornell_box, lambda: sphere_grid(16)])
    def test_matches_xla_on_shared_sobol_draws(self, maker):
        # sobol draws are bit-identical across backends, and in interpret
        # mode the kernel lowers to the same jnp ops as the wavefront --
        # the images agree to float tolerance.
        scene = compile_scene(maker())
        a = np.asarray(
            render_chunk_pallas_dynamic(
                scene, make_key(1), np.uint32(0), interpret=True, **KW
            )
        )
        b = np.asarray(render_chunk(scene, make_key(1), jnp.uint32(0), **KW))
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)

    def test_scene_edit_same_executable(self):
        # The headline property: a scene VALUE change (same table sizes)
        # must reuse the compiled renderer -- the builder cache must not
        # grow, and the render must track the new scene.
        scene = compile_scene(cornell_box())
        _ = render_chunk_pallas_dynamic(
            scene, make_key(2), np.uint32(0), interpret=True, **KW
        )
        info0 = _build_renderer_dyn.cache_info()
        moved = scene._replace(
            sphere_center=type(scene.sphere_center)(
                scene.sphere_center.x + 30.0,
                scene.sphere_center.y,
                scene.sphere_center.z,
            )
        )
        img_moved = np.asarray(
            render_chunk_pallas_dynamic(
                moved, make_key(2), np.uint32(0), interpret=True, **KW
            )
        )
        info1 = _build_renderer_dyn.cache_info()
        assert info1.misses == info0.misses, "scene edit recompiled the kernel"
        # And the edit is actually visible: matches the wavefront on the
        # MOVED scene, not the original.
        ref_moved = np.asarray(
            render_chunk(moved, make_key(2), jnp.uint32(0), **KW)
        )
        np.testing.assert_allclose(img_moved, ref_moved, rtol=1e-4, atol=1e-4)

    def test_padding_path(self):
        # 24x24x8 = 4608 rays: not a block multiple at rows=16 (2048) ->
        # pads to 6144 with 1536 dead lanes; sums must still match the
        # wavefront exactly (dead lanes contribute nothing).
        scene = compile_scene(cornell_box())
        a = np.asarray(
            render_chunk_pallas_dynamic(
                scene, make_key(7), np.uint32(0), interpret=True, **KW
            )
        )
        b = np.asarray(render_chunk(scene, make_key(7), jnp.uint32(0), **KW))
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)

    def test_deterministic(self):
        scene = compile_scene(cornell_box())
        a = np.asarray(
            render_chunk_pallas_dynamic(
                scene, make_key(3), np.uint32(0), interpret=True, **KW
            )
        )
        b = np.asarray(
            render_chunk_pallas_dynamic(
                scene, make_key(3), np.uint32(0), interpret=True, **KW
            )
        )
        np.testing.assert_array_equal(a, b)

    def test_sample_offset_extends_stream(self):
        scene = compile_scene(cornell_box())
        kw = dict(KW, spp_chunk=4)
        a = np.asarray(
            render_chunk_pallas_dynamic(
                scene, make_key(5), np.uint32(0), interpret=True, **kw
            )
        )
        b = np.asarray(
            render_chunk_pallas_dynamic(
                scene, make_key(5), np.uint32(4), interpret=True, **kw
            )
        )
        full = np.asarray(
            render_chunk_pallas_dynamic(
                scene, make_key(5), np.uint32(0), interpret=True, **KW
            )
        )
        np.testing.assert_allclose(a + b, full, rtol=1e-5, atol=1e-5)


class TestNeeMode:
    @pytest.mark.parametrize(
        "maker", [cornell_box, cornell_panel, lambda: sphere_grid(16)]
    )
    def test_nee_matches_xla_on_shared_sobol_draws(self, maker):
        # The in-kernel light table (traced power-proportional rows over
        # ALL spheres+planes) must reproduce the XLA wavefront's NEE
        # estimator on bit-shared draws -- sphere emitters, rectangle
        # panel emitters, and many-object scenes.
        scene = compile_scene(maker())
        kw = dict(KW, mode="nee")
        a = np.asarray(
            render_chunk_pallas_dynamic(
                scene, make_key(1), np.uint32(0), interpret=True, **kw
            )
        )
        b = np.asarray(render_chunk(scene, make_key(1), jnp.uint32(0), **kw))
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)

    def test_emission_edit_reweights_without_recompile(self):
        # Doubling the light's emission must (a) not rebuild the kernel
        # and (b) double the image brightness -- the light-selection
        # probabilities and pickup densities are traced values.
        scene = compile_scene(cornell_box())
        kw = dict(KW, mode="nee")
        base = np.asarray(
            render_chunk_pallas_dynamic(
                scene, make_key(6), np.uint32(0), interpret=True, **kw
            )
        )
        info0 = _build_renderer_dyn.cache_info()
        brighter = scene._replace(
            mat_emission=type(scene.mat_emission)(
                scene.mat_emission.x * 2,
                scene.mat_emission.y * 2,
                scene.mat_emission.z * 2,
            )
        )
        img = np.asarray(
            render_chunk_pallas_dynamic(
                brighter, make_key(6), np.uint32(0), interpret=True, **kw
            )
        )
        info1 = _build_renderer_dyn.cache_info()
        assert info1.misses == info0.misses, "emission edit recompiled"
        # Same draws, emission strictly linear in this scene's paths
        # (selection probs are scale-invariant): exactly 2x.
        np.testing.assert_allclose(img, base * 2.0, rtol=1e-5, atol=1e-5)


class TestScope:
    def test_rejects_sdf_scenes(self):
        scene = compile_scene(sdf_gallery())
        with pytest.raises(NotImplementedError, match="SDF"):
            render_chunk_pallas_dynamic(
                scene, make_key(0), np.uint32(0), interpret=True, **KW
            )
