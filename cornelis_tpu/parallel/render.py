"""Mesh-sharded render: the TBB tile loop (src/Render.cpp:335-354) as a
`shard_map` over a (tiles, samples) device mesh.

Mapping from the reference:

  * one TBB tile task          -> one shard of the pixel axis on one device;
  * dynamic work stealing      -> static equal split (wavefronts are
                                  uniform-cost by construction: fixed-shape
                                  masked bounce loop, no per-tile variance
                                  in dispatch size);
  * disjoint framebuffer tiles -> out_specs P('tiles') -- each device owns
                                  its pixel rows, gathered once at the end;
  * zero inter-tile comms      -> `psum` over the `samples` axis only when
                                  spp is sharded (pure tile-DP keeps the
                                  reference's zero-communication property).

Determinism: RNG keys depend only on global ray ids, so the rendered image
is invariant to the mesh shape (tested against the single-device renderer in
tests/test_parallel.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ..integrator import integrate_pixel_samples
from ..scene.compile import SceneArrays
from .mesh import SAMPLE_AXIS, TILE_AXIS

Array = jnp.ndarray


def _check_divisible(value: int, by: int, what: str) -> None:
    if value % by != 0:
        raise ValueError(
            f"{what} ({value}) must be divisible by the mesh axis size {by}"
        )


@partial(
    jax.jit,
    static_argnames=(
        "mesh",
        "width",
        "height",
        "spp_chunk",
        "spp_total",
        "max_depth",
        "unroll_bounces",
        "sampler",
    ),
)
def render_chunk_mesh(
    scene: SceneArrays,
    root_key: Array,
    sample_offset: Array,
    *,
    mesh: Mesh,
    width: int,
    height: int,
    spp_chunk: int,
    spp_total: int,
    max_depth: int,
    unroll_bounces: bool = False,
    sampler: str = "uniform",
) -> Array:
    """Render one sample chunk over the mesh; returns (H, W, 3) radiance
    sums, identical (modulo float reduction order when spp is sharded) to
    `integrator.render_chunk`.

    Pixels are sharded over `tiles`, the chunk's samples over `samples`;
    per-pixel partial sums are psum'd over `samples`. The output carries a
    P('tiles') row sharding -- on a real pod each host device_get()s only
    the rows it owns.
    """
    n_tiles = mesh.shape[TILE_AXIS]
    n_samp = mesh.shape[SAMPLE_AXIS]
    num_pixels = width * height
    _check_divisible(num_pixels, n_tiles, "pixel count")
    _check_divisible(spp_chunk, n_samp, "spp chunk")

    pixel_ids = jnp.arange(num_pixels, dtype=jnp.uint32)
    sample_idx = sample_offset + jnp.arange(spp_chunk, dtype=jnp.uint32)

    def shard_fn(scene_rep, key_rep, px_shard, samp_shard):
        part = integrate_pixel_samples(
            scene_rep,
            key_rep,
            px_shard,
            samp_shard,
            width=width,
            height=height,
            spp_total=spp_total,
            max_depth=max_depth,
            unroll_bounces=unroll_bounces,
            sampler=sampler,
        )
        if n_samp > 1:
            part = jax.lax.psum(part, SAMPLE_AXIS)
        return part

    scene_spec = jax.tree.map(lambda _: P(), scene)
    # check_vma=False: the integrator's loop carries are initialized with
    # constants (replicated), which the varying-manual-axes checker rejects;
    # the psum over `samples` is the only cross-shard dependence and is
    # explicit above.
    img = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(scene_spec, P(), P(TILE_AXIS), P(SAMPLE_AXIS)),
        out_specs=P(TILE_AXIS, None),
        check_vma=False,
    )(scene, root_key, pixel_ids, sample_idx)
    img = img.reshape(height, width, 3)
    # Keep the row ownership explicit for downstream consumers.
    return jax.lax.with_sharding_constraint(
        img, NamedSharding(mesh, P(TILE_AXIS, None, None))
        if height % n_tiles == 0
        else NamedSharding(mesh, P(None, None, None)),
    )
