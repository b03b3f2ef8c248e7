"""Dynamic-scene Pallas megakernel (round-5 prototype).

The production megakernel (pallas_integrator.py) bakes scene tables as
compile-time literals: peak throughput, but ANY scene change -- an
animated transform, an inverse-render preview mid-training -- recompiles
the kernel (1-25 s by scene size, PERF.md "Scene-size compile scaling").
This variant takes the scene as SMEM *operands* instead: the kernel is
compiled once per (table sizes, frame shape, depth, sampler) bucket and
renders ANY scene of those sizes with no recompile and no host-side
scene fetch (tables come straight from the device-resident SceneArrays).

Design found by measurement (PERF.md section 2 "dynamic-scene kernel"):

  * per-bounce SMEM reads inside the while_loop serialize -- rolled
    fori_loops over the tables ran the whole kernel at 0.28x baked, and
    unrolled-but-in-loop reads at 0.36x;
  * the shipped structure reads EVERY table scalar ONCE per block before
    the bounce loop (the values are loop-invariant) and feeds them
    through the SAME scan/gather code the baked kernel uses
    (_intersect_const / _gather_materials_const accept traced scalars in
    place of Python-float literals) -- so the bounce loop is
    structurally identical to the baked kernel's, with register-resident
    scene values instead of instruction immediates.

PROTOTYPE SCOPE (documented, asserted): path mode, uniform/sobol
samplers, spheres + finite-rectangle planes. NEE mode and SDFs stay on
the baked kernel (the NEE light table is host-computed from emission
values -- power-proportional selection needs cumulative sums the kernel
would have to build from SMEM -- and SDF params ride a nested tuple;
both are the recorded next steps). Sobol draws are bit-identical across
all backends, so the parity tests compare this kernel against the XLA
wavefront on common draws (tests/test_dynamic.py).

Reference anchor: same estimator as src/Render.cpp:110-255 (see
integrator.py); this file only changes where the kernel READS the scene.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..camera import Camera, generate_rays
from ..integrator import russian_roulette_probability
from ..math.vec import RGB, Vec3, construct_basis, dot
from ..materials import layered_sample
from ..scene.compile import SceneArrays
from .pallas_integrator import (
    BOUNCE_EPSILON,
    DEFAULT_ROWS,
    LANES,
    HostScene,
    _gather_materials_const,
    _intersect_const,
)
from .threefry import pair_uniforms

Array = jnp.ndarray


def _read_tables(sph_ref, pln_ref, mat_ref, n_spheres, n_planes, n_materials):
    """Read every scene scalar ONCE (loop-invariant hoist the compiler
    does not do across the bounce while_loop) into a HostScene-shaped
    tuple of traced scalars, consumable by the baked kernel's
    _intersect_const / _gather_materials_const."""
    spheres = tuple(
        (
            sph_ref[j, 0],
            sph_ref[j, 1],
            sph_ref[j, 2],
            sph_ref[j, 3],
            sph_ref[j, 4],
        )
        for j in range(n_spheres)
    )
    planes = tuple(
        (
            pln_ref[j, 0],
            pln_ref[j, 1],
            pln_ref[j, 2],
            pln_ref[j, 3],
            pln_ref[j, 4],
            pln_ref[j, 5],
            pln_ref[j, 6],
            pln_ref[j, 7],
            # material id as int32: _update-style selects mix it with the
            # int32 running-best id.
            pln_ref[j, 8].astype(jnp.int32),
        )
        for j in range(n_planes)
    )
    materials = tuple(
        (
            (mat_ref[m, 0], mat_ref[m, 1], mat_ref[m, 2]),
            (mat_ref[m, 3], mat_ref[m, 4], mat_ref[m, 5]),
            (mat_ref[m, 6], mat_ref[m, 7], mat_ref[m, 8]),
            mat_ref[m, 9],
            mat_ref[m, 10],
        )
        for m in range(n_materials)
    )
    return HostScene(
        camera=None, spheres=spheres, planes=planes, materials=materials, sdfs=()
    )


def _make_kernel_dyn(
    n_spheres: int,
    n_planes: int,
    n_materials: int,
    width: int,
    height: int,
    max_depth: int,
    sampler: str,
    index_bits: int,
):
    def kernel(key_ref, cam_ref, sph_ref, pln_ref, mat_ref,
               px_ref, si_ref, r_ref, g_ref, b_ref):
        k0 = key_ref[0, 0]
        k1 = key_ref[0, 1]
        px = px_ref[:]
        si = si_ref[:]

        if sampler == "sobol":
            from ..sampling import hash32, sobol_pair

            seed = hash32(px ^ key_ref[0, 2])

            def draw_pair(stream, pair):
                return sobol_pair(seed, si, stream, pair, index_bits)

        else:

            def draw_pair(stream, pair):
                return pair_uniforms(k0, k1, px, si, stream, pair)

        cam = Camera(
            eye=Vec3(cam_ref[0, 0], cam_ref[0, 1], cam_ref[0, 2]),
            corner=Vec3(cam_ref[0, 3], cam_ref[0, 4], cam_ref[0, 5]),
            u=Vec3(cam_ref[0, 6], cam_ref[0, 7], cam_ref[0, 8]),
            v=Vec3(cam_ref[0, 9], cam_ref[0, 10], cam_ref[0, 11]),
        )
        pseudo = _read_tables(
            sph_ref, pln_ref, mat_ref, n_spheres, n_planes, n_materials
        )

        u0, u1 = draw_pair(np.uint32(0), 0)
        fi = (px % np.uint32(width)).astype(jnp.int32).astype(jnp.float32)
        fj = (px // np.uint32(width)).astype(jnp.int32).astype(jnp.float32)
        x = (fi + u0) * (1.0 / width)
        y = (fj + u1) * (1.0 / height)
        o, d = generate_rays(cam, x, y)

        ones = jnp.ones_like(x)
        zeros = jnp.zeros_like(x)

        def bounce(carry):
            # active carried as f32 mask (Mosaic cannot legalize i1
            # vectors in scf.while carries) -- same as the baked kernel.
            o, d, tput, rad, active_f, depth = carry
            t, p, n, mid, hit, _sph_idx = _intersect_const(pseudo, o, d)
            active = (active_f > 0.0) & hit

            params = _gather_materials_const(pseudo.materials, mid)

            contrib = tput * params.emission
            rad = RGB(
                rad.x + jnp.where(active, contrib.x, 0.0),
                rad.y + jnp.where(active, contrib.y, 0.0),
                rad.z + jnp.where(active, contrib.z, 0.0),
            )

            stream = (depth + 1).astype(jnp.uint32)
            x0, x1 = draw_pair(stream, 0)
            x2, u_rr = draw_pair(stream, 1)

            prob = russian_roulette_probability(tput, depth)
            survive = u_rr <= prob

            basis = construct_basis(n)
            w_out = -d
            wi, pdf, f = layered_sample(w_out, x0, x1, x2, basis, params)

            new_o = p + wi * BOUNCE_EPSILON
            scale = jnp.abs(dot(wi, n)) / (pdf * prob)
            new_tput = tput * f * scale

            active = active & survive
            sel = lambda a, b: jnp.where(active, a, b)
            return (
                Vec3(sel(new_o.x, o.x), sel(new_o.y, o.y), sel(new_o.z, o.z)),
                Vec3(sel(wi.x, d.x), sel(wi.y, d.y), sel(wi.z, d.z)),
                RGB(
                    sel(new_tput.x, tput.x),
                    sel(new_tput.y, tput.y),
                    sel(new_tput.z, tput.z),
                ),
                rad,
                jnp.where(active, 1.0, 0.0).astype(jnp.float32),
                depth + 1,
            )

        depth0 = (px[0, 0] & np.uint32(0)).astype(jnp.int32)
        carry = (
            o,
            d,
            RGB(ones, ones, ones),
            RGB(zeros, zeros, zeros),
            ones,
            depth0,
        )
        carry = jax.lax.while_loop(
            lambda c: (c[5] < max_depth) & (jnp.max(c[4]) > 0.0),
            bounce,
            carry,
        )
        rad = carry[3]
        r_ref[:] = rad.x
        g_ref[:] = rad.y
        b_ref[:] = rad.z

    return kernel


@functools.lru_cache(maxsize=32)
def _build_renderer_dyn(
    n_spheres: int,
    n_planes: int,
    n_materials: int,
    width: int,
    height: int,
    max_depth: int,
    num_blocks: int,
    rows: int,
    interpret: bool,
    sampler: str,
    index_bits: int,
):
    if not interpret:
        from ..utils.logging import logger

        logger.info(
            "Compiling DYNAMIC-scene Pallas kernel for %dx%d (S=%d P=%d M=%d,"
            " max_depth %d, %d blocks, sampler %s) -- compiled ONCE per"
            " table-size bucket; subsequent scene changes do not recompile.",
            width, height, n_spheres, n_planes, n_materials,
            max_depth, num_blocks, sampler,
        )
    kernel = _make_kernel_dyn(
        n_spheres, n_planes, n_materials, width, height, max_depth,
        sampler, index_bits,
    )
    block = (rows, LANES)
    out_shape = jax.ShapeDtypeStruct((num_blocks * rows, LANES), jnp.float32)
    smem = lambda shape: pl.BlockSpec(
        shape, lambda i: (0, 0), memory_space=pltpu.SMEM
    )
    call = pl.pallas_call(
        kernel,
        grid=(num_blocks,),
        in_specs=[
            smem((1, 3)),                       # key row
            smem((1, 12)),                      # camera
            smem((max(n_spheres, 1), 5)),       # spheres
            smem((max(n_planes, 1), 9)),        # planes
            smem((max(n_materials, 1), 11)),    # materials
            pl.BlockSpec(block, lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(block, lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(block, lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(block, lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(block, lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(out_shape, out_shape, out_shape),
        interpret=interpret,
    )

    @jax.jit
    def run(key2, cam, sph, pln, mat, px, si):
        return call(key2, cam, sph, pln, mat, px, si)

    return run


def _scene_tables(scene: SceneArrays):
    """Pack the device-resident SceneArrays into the kernel's SMEM table
    layout -- pure jnp (no host transfer)."""
    cam = scene.camera
    cam_row = jnp.stack(
        [
            cam.eye.x, cam.eye.y, cam.eye.z,
            cam.corner.x, cam.corner.y, cam.corner.z,
            cam.u.x, cam.u.y, cam.u.z,
            cam.v.x, cam.v.y, cam.v.z,
        ]
    ).reshape(1, 12).astype(jnp.float32)
    if scene.num_spheres:
        sph = jnp.stack(
            [
                scene.sphere_center.x,
                scene.sphere_center.y,
                scene.sphere_center.z,
                scene.sphere_radius,
                scene.sphere_material.astype(jnp.float32),
            ],
            axis=1,
        ).astype(jnp.float32)
    else:
        sph = jnp.zeros((1, 5), jnp.float32)
    if scene.num_planes:
        pln = jnp.stack(
            [
                scene.plane_normal.x,
                scene.plane_normal.y,
                scene.plane_normal.z,
                scene.plane_point.x,
                scene.plane_point.y,
                scene.plane_point.z,
                scene.plane_width,
                scene.plane_height,
                scene.plane_material.astype(jnp.float32),
            ],
            axis=1,
        ).astype(jnp.float32)
    else:
        pln = jnp.zeros((1, 9), jnp.float32)
    mat = jnp.stack(
        [
            scene.mat_albedo.x, scene.mat_albedo.y, scene.mat_albedo.z,
            scene.mat_emission.x, scene.mat_emission.y, scene.mat_emission.z,
            scene.mat_tint.x, scene.mat_tint.y, scene.mat_tint.z,
            scene.mat_roughness,
            scene.mat_ior,
        ],
        axis=1,
    ).astype(jnp.float32)
    return cam_row, sph, pln, mat


def render_chunk_pallas_dynamic(
    scene: SceneArrays,
    root_key,
    sample_offset,
    *,
    width: int,
    height: int,
    spp_chunk: int,
    spp_total: int,
    max_depth: int,
    sampler: str = "uniform",
    rows: int = 0,
    interpret: bool = False,
) -> Array:
    """One sample chunk through the dynamic-scene megakernel; returns
    (H, W, 3) radiance SUMS over the chunk (same accumulation contract as
    integrator.render_chunk / render_chunk_pallas). Path mode only --
    see the module docstring for the prototype scope."""
    if scene.num_sdfs:
        raise NotImplementedError(
            "dynamic-scene kernel prototype does not support SDFs; use the "
            "baked kernel (render_chunk_pallas) or the XLA wavefront"
        )
    from ..sampling import hash32

    rows = rows or DEFAULT_ROWS
    num_pixels = width * height
    n_rays = num_pixels * spp_chunk
    block_rays = rows * LANES
    n_pad = (n_rays + block_rays - 1) // block_rays * block_rays
    num_blocks = n_pad // block_rays

    key_words = jax.random.key_data(root_key).astype(jnp.uint32).reshape(2)
    sobol_root = hash32(
        jax.random.bits(jax.random.fold_in(root_key, 0x50B0), (), jnp.uint32)
    )
    key2 = jnp.concatenate([key_words, sobol_root.reshape(1)]).reshape(1, 3)

    px = jnp.repeat(jnp.arange(num_pixels, dtype=jnp.uint32), spp_chunk)
    si = jnp.asarray(sample_offset, jnp.uint32) + jnp.tile(
        jnp.arange(spp_chunk, dtype=jnp.uint32), num_pixels
    )
    if n_pad != n_rays:
        pad = jnp.zeros(n_pad - n_rays, jnp.uint32)
        px = jnp.concatenate([px, pad])
        si = jnp.concatenate([si, pad])
    px = px.reshape(num_blocks * rows, LANES)
    si = si.reshape(num_blocks * rows, LANES)

    index_bits = max(1, (spp_total - 1).bit_length())
    run = _build_renderer_dyn(
        scene.num_spheres,
        scene.num_planes,
        int(scene.mat_roughness.shape[0]),
        width,
        height,
        max_depth,
        num_blocks,
        rows,
        interpret,
        sampler,
        index_bits,
    )
    cam_row, sph, pln, mat = _scene_tables(scene)
    r, g, b = run(key2, cam_row, sph, pln, mat, px, si)

    def pixel_sum(c):
        return (
            c.reshape(-1)[:n_rays].reshape(num_pixels, spp_chunk).sum(axis=1)
        )

    img = jnp.stack([pixel_sum(r), pixel_sum(g), pixel_sum(b)], axis=-1)
    return img.reshape(height, width, 3)
