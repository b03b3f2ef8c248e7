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

SCOPE: path AND nee modes, uniform/sobol samplers, spheres +
finite-rectangle planes. The NEE light-selection table is built
IN-KERNEL from the traced tables (_light_rows_dyn: every sphere/plane
is a candidate row with power-proportional traced probability --
zero-power rows are never selected by the cumulative chain and carry
zero pickup density, unlike the baked kernel which drops them at build
time for ~10% on Cornell), so emission or geometry edits re-weight
light sampling with no recompile (measured: doubling L_e re-renders in
0.3 s at exactly 2.00x brightness). SDFs are the remaining gap (their
params ride a nested per-kind tuple). Sobol draws are bit-identical
across all backends, so the parity tests compare this kernel against
the XLA wavefront on common draws (tests/test_dynamic.py).

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
from ..integrator import nee_clamp_at_depth, russian_roulette_probability
from ..math.vec import PI, RGB, Vec3, construct_basis, dot
from ..materials import layered_eval, layered_pdf_true, layered_sample
from ..scene.compile import SceneArrays
from .pallas_integrator import (
    BOUNCE_EPSILON,
    DEFAULT_ROWS,
    LANES,
    HostScene,
    _gather_materials_const,
    _intersect_const,
    _occluded_const,
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


def _light_rows_dyn(pseudo: HostScene):
    """The NEE light-selection table from TRACED scalars -- the dynamic
    twin of pallas_integrator._light_table, built in-kernel so emission or
    geometry edits re-weight the selection with no recompile. Every
    sphere/plane is a row (structure cannot depend on traced VALUES, so
    zero-power rows stay -- they carry prob 0, are never selected by the
    cumulative chain, and their MIS pickup density is 0; the baked kernel
    drops them at build time instead, ~10% cheaper on Cornell). Rows
    (prob, cum, kind, prim, g(8), le(3)) match the baked layout: kind and
    prim are Python ints (structural), everything else traced."""
    import math

    def emission_of(mid):
        le = [jnp.zeros_like(mid) for _ in range(3)]
        for m, row in enumerate(pseudo.materials):
            mf = (mid == m * 1.0).astype(jnp.float32)
            for c in range(3):
                le[c] = le[c] + mf * row[1][c]
        return le

    rows = []
    total = 0.0
    n_sph = len(pseudo.spheres)
    for i, (cx, cy, cz, rad, mid) in enumerate(pseudo.spheres):
        le = emission_of(mid)
        lum = 0.2126 * le[0] + 0.7152 * le[1] + 0.0722 * le[2]
        power = lum * (4.0 * math.pi) * rad * rad
        rows.append([power, 0, i, (cx, cy, cz, rad, 0.0, 0.0, 0.0, 0.0), le])
        total = total + power
    for j, (nx, ny, nz, px, py, pz, w, h, mid) in enumerate(pseudo.planes):
        le = emission_of(mid * 1.0)
        lum = 0.2126 * le[0] + 0.7152 * le[1] + 0.0722 * le[2]
        power = lum * w * h
        rows.append([power, 1, n_sph + j, (nx, ny, nz, px, py, pz, w, h), le])
        total = total + power
    inv_total = 1.0 / jnp.maximum(total, 1e-30)
    out = []
    cum = 0.0
    for power, kind, prim, geom, le in rows:
        prob = power * inv_total
        cum = cum + prob
        out.append((prob, cum, kind, prim, geom, le))
    return tuple(out)


def _clamp_base_dyn(pseudo: HostScene):
    """Scale-aware NEE clamp base from traced materials (the dynamic twin
    of _host_nee_clamp: 16 x max emission channel, floored at 1)."""
    from ..integrator import NEE_CLAMP_FACTOR

    max_e = jnp.float32(0.0)
    for row in pseudo.materials:
        for c in range(3):
            max_e = jnp.maximum(max_e, row[1][c])
    return NEE_CLAMP_FACTOR * jnp.maximum(max_e, 1.0)


def _make_kernel_dyn(
    n_spheres: int,
    n_planes: int,
    n_materials: int,
    width: int,
    height: int,
    max_depth: int,
    sampler: str,
    index_bits: int,
    mode: str = "path",
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
        nee = mode == "nee"
        if nee:
            lights = _light_rows_dyn(pseudo)
            clamp_val = _clamp_base_dyn(pseudo)
            has_sph = n_spheres > 0
            has_pln = n_planes > 0

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
            o, d, tput, rad, active_f, prev_pdf, depth = carry
            t, p, n, mid, hit, sph_idx = _intersect_const(pseudo, o, d)
            active = (active_f > 0.0) & hit

            params = _gather_materials_const(pseudo.materials, mid)

            contrib = tput * params.emission
            if nee:
                # MIS pickup weight vs the light-sampling strategy --
                # identical structure to the baked kernel's nee branch;
                # rows carry traced scalars (prob can be 0 for
                # non-emitting objects: their pickup density is 0, so
                # the weight degrades to the path weight exactly there).
                p_light = jnp.zeros_like(t)
                for pr, _, lkind, lprim, g, _le in lights:
                    if lkind == 0:
                        lcx, lcy, lcz, lrad = g[0], g[1], g[2], g[3]
                        d2 = (
                            (lcx - o.x) ** 2
                            + (lcy - o.y) ** 2
                            + (lcz - o.z) ** 2
                        )
                        sin2max = jnp.clip(
                            lrad * lrad / jnp.maximum(d2, 1e-12), 0.0, 1.0
                        )
                        cos_max = jnp.sqrt(jnp.maximum(1.0 - sin2max, 0.0))
                        cand = pr / (
                            2.0 * PI * jnp.maximum(1.0 - cos_max, 1e-9)
                        )
                        cand = jnp.where(
                            d2 > (lrad * lrad) * 1.0002, cand, 0.0
                        )
                    else:
                        lnx, lny, lnz = g[0], g[1], g[2]
                        area = jnp.maximum(g[6] * g[7], 1e-12)
                        cos_l = jnp.abs(
                            d.x * lnx + d.y * lny + d.z * lnz
                        )
                        cand = (
                            pr * t * t / (area * jnp.maximum(cos_l, 1e-6))
                        )
                    p_light = jnp.where(sph_idx == lprim, cand, p_light)
                w_emis = jnp.where(
                    depth > 0,
                    prev_pdf / jnp.maximum(prev_pdf + p_light, 1e-12),
                    1.0,
                )
                cl_d = nee_clamp_at_depth(clamp_val, depth)
                cl = jnp.where(depth > 0, cl_d, jnp.inf)
                contrib = RGB(
                    jnp.minimum(contrib.x * w_emis, cl),
                    jnp.minimum(contrib.y * w_emis, cl),
                    jnp.minimum(contrib.z * w_emis, cl),
                )
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

            if nee:
                u_sel, ul1 = draw_pair(stream, 2)
                ul2, _spare = draw_pair(stream, 3)

                def lit_select(field):
                    acc = jnp.full_like(t, field(lights[0]))
                    for row, prev in zip(lights[1:], lights[:-1]):
                        acc = jnp.where(u_sel > prev[1], field(row), acc)
                    return acc

                lg = [lit_select(lambda r, i=i: r[4][i]) for i in range(8)]
                lpr = lit_select(lambda r: r[0])
                ler = lit_select(lambda r: r[5][0])
                leg = lit_select(lambda r: r[5][1])
                leb = lit_select(lambda r: r[5][2])

                if has_sph:
                    lcx, lcy, lcz, lrad = lg[0], lg[1], lg[2], lg[3]
                    to_c = Vec3(lcx - p.x, lcy - p.y, lcz - p.z)
                    d2 = to_c.x**2 + to_c.y**2 + to_c.z**2
                    dist = jnp.sqrt(jnp.maximum(d2, 1e-12))
                    outside = dist > lrad * 1.0001
                    sin2max = jnp.clip(
                        lrad * lrad / jnp.maximum(d2, 1e-12), 0.0, 1.0
                    )
                    cos_max = jnp.sqrt(jnp.maximum(1.0 - sin2max, 0.0))
                    one_minus = jnp.maximum(1.0 - cos_max, 1e-9)
                    cos_t = 1.0 - ul1 * one_minus
                    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
                    phi = 2.0 * PI * ul2
                    laxis = Vec3(to_c.x / dist, to_c.y / dist, to_c.z / dist)
                    lbasis = construct_basis(laxis)
                    wi_s = (
                        lbasis.t * (sin_t * jnp.cos(phi))
                        + lbasis.b * (sin_t * jnp.sin(phi))
                        + lbasis.n * cos_t
                    )
                    t_s = dist * cos_t - jnp.sqrt(
                        jnp.maximum(
                            lrad * lrad - d2 * (1.0 - cos_t * cos_t), 0.0
                        )
                    )
                    pdf_s = lpr / (2.0 * PI * one_minus)
                    valid_s = outside & (t_s > 0.0)

                if has_pln:
                    lnrm = Vec3(lg[0], lg[1], lg[2])
                    lanchor = Vec3(lg[3], lg[4], lg[5])
                    lw, lh = lg[6], lg[7]
                    pl_basis = construct_basis(lnrm)
                    q = (
                        lanchor
                        + pl_basis.t * ((ul1 - 0.5) * lw)
                        + pl_basis.b * ((ul2 - 0.5) * lh)
                    )
                    to_q = Vec3(q.x - p.x, q.y - p.y, q.z - p.z)
                    d2q = to_q.x**2 + to_q.y**2 + to_q.z**2
                    dq = jnp.sqrt(jnp.maximum(d2q, 1e-12))
                    wi_p = Vec3(to_q.x / dq, to_q.y / dq, to_q.z / dq)
                    cos_lp = jnp.abs(dot(wi_p, lnrm))
                    area = jnp.maximum(lw * lh, 1e-12)
                    pdf_p = lpr * d2q / (area * jnp.maximum(cos_lp, 1e-6))
                    valid_p = (cos_lp > 1e-6) & (dq > 1e-6)

                if has_sph and has_pln:
                    is_pln = lit_select(lambda r: float(r[2])) > 0.5
                    wi_l = Vec3(
                        jnp.where(is_pln, wi_p.x, wi_s.x),
                        jnp.where(is_pln, wi_p.y, wi_s.y),
                        jnp.where(is_pln, wi_p.z, wi_s.z),
                    )
                    t_light = jnp.where(is_pln, dq, t_s)
                    pdf_l = jnp.maximum(
                        jnp.where(is_pln, pdf_p, pdf_s), 1e-12
                    )
                    valid_l = (is_pln & valid_p) | (~is_pln & valid_s)
                elif has_pln:
                    wi_l, t_light, valid_l = wi_p, dq, valid_p
                    pdf_l = jnp.maximum(pdf_p, 1e-12)
                else:
                    wi_l, t_light, valid_l = wi_s, t_s, valid_s
                    pdf_l = jnp.maximum(pdf_s, 1e-12)
                cos_surf = dot(wi_l, n)
                shadow_o = p + wi_l * BOUNCE_EPSILON
                pre_mask = active & valid_l & (cos_surf > 0.0)
                visible = ~_occluded_const(
                    pseudo, shadow_o, wi_l, t_light * (1.0 - 1e-3)
                )
                f_l = layered_eval(wi_l, w_out, n, params)
                p_bsdf_l = layered_pdf_true(wi_l, w_out, n, params)
                mis_l = pdf_l / jnp.maximum(pdf_l + p_bsdf_l, 1e-12)
                nee_mask = pre_mask & visible
                nee_scale = jnp.where(nee_mask, mis_l * cos_surf / pdf_l, 0.0)
                cl2 = nee_clamp_at_depth(clamp_val, depth)
                rad = RGB(
                    rad.x + jnp.minimum(tput.x * f_l.x * ler * nee_scale, cl2),
                    rad.y + jnp.minimum(tput.y * f_l.y * leg * nee_scale, cl2),
                    rad.z + jnp.minimum(tput.z * f_l.z * leb * nee_scale, cl2),
                )

            wi, pdf, f = layered_sample(w_out, x0, x1, x2, basis, params)
            if nee:
                pdf = layered_pdf_true(wi, w_out, n, params)

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
                sel(pdf, prev_pdf) if nee else prev_pdf,
                depth + 1,
            )

        depth0 = (px[0, 0] & np.uint32(0)).astype(jnp.int32)
        carry = (
            o,
            d,
            RGB(ones, ones, ones),
            RGB(zeros, zeros, zeros),
            ones,
            ones,  # prev_pdf (MIS carry; unused in path mode)
            depth0,
        )
        carry = jax.lax.while_loop(
            lambda c: (c[6] < max_depth) & (jnp.max(c[4]) > 0.0),
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
    mode: str = "path",
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
        sampler, index_bits, mode,
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
    mode: str = "path",
) -> Array:
    """One sample chunk through the dynamic-scene megakernel; returns
    (H, W, 3) radiance SUMS over the chunk (same accumulation contract as
    integrator.render_chunk / render_chunk_pallas). mode="nee" builds the
    light-selection table IN-KERNEL from the traced tables (every
    sphere/plane is a candidate row with power-proportional traced
    probability), so emission/geometry edits re-weight light sampling
    with no recompile. See the module docstring for the remaining
    prototype scope (no SDFs)."""
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
        mode,
    )
    cam_row, sph, pln, mat = _scene_tables(scene)
    r, g, b = run(key2, cam_row, sph, pln, mat, px, si)

    def pixel_sum(c):
        return (
            c.reshape(-1)[:n_rays].reshape(num_pixels, spp_chunk).sum(axis=1)
        )

    img = jnp.stack([pixel_sum(r), pixel_sum(g), pixel_sum(b)], axis=-1)
    return img.reshape(height, width, 3)
