"""Differentiable rendering.

A capability the reference does not have (its north star here): pixel
gradients with respect to scene parameters -- material albedo, emission,
tint, roughness, object positions/radii -- through the full Monte Carlo
path-tracing estimator.

Estimator: *detached sampling* (integrator.py `detach_sampling`): sampled
directions, pdfs, and Russian-roulette probabilities are stop_gradient'd;
gradients flow through BRDF evaluations, emission, the cosine factor, and
the intersection geometry (hit positions/normals are differentiable in the
interior; silhouette/visibility gradients are out of scope, SURVEY.md
section 7 "Hard parts"). The bounce loop is a fixed-depth `fori_loop`
(`unroll_bounces=True`) because `lax.while_loop` has no reverse-mode rule;
RR keeps P(alive at depth d) <= 0.55^(d-3), so a max_depth of 8-16 bounds
the truncation bias far below MC noise.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..integrator import integrate_pixel_samples
from ..scene.compile import SceneArrays

Array = jnp.ndarray


@partial(
    jax.jit,
    static_argnames=("width", "height", "spp", "max_depth", "detach", "mode"),
)
def render_diff(
    scene: SceneArrays,
    root_key: Array,
    *,
    width: int,
    height: int,
    spp: int,
    max_depth: int = 8,
    detach: bool = True,
    mode: str = "path",
) -> Array:
    """Differentiable render: (H, W, 3) radiance *means* over spp.

    Differentiable in every SceneArrays leaf (materials, sphere centers and
    radii, plane anchors, camera vectors). Uses the same global-ray-id RNG
    as the forward renderer, so with a common key the estimator is a
    deterministic function of the scene -- finite differences against it
    are low-variance (common random numbers).

    detach=False switches to the fully-attached pathwise estimator
    (gradients also flow through the GGX inverse-CDF sampler and pdfs --
    and in nee mode through the cone/area light sampling). Higher
    variance, but its gradient matches finite differences of this very
    function exactly -- used by the FD test suite; detached is the
    production default.

    mode="nee" (round 5) differentiates the next-event-estimation
    estimator: detached light sampling (stop_gradient on the sampled
    light direction/distance/density), gradients through the BRDF,
    emission, cosine, and MIS weights (integrator._bounce). Same ~65x
    stochastic-variance win the forward path measured (README equal-time
    table), now available to inverse rendering.
    """
    num_pixels = width * height
    pixel_ids = jnp.arange(num_pixels, dtype=jnp.uint32)
    sample_idx = jnp.arange(spp, dtype=jnp.uint32)
    sums = integrate_pixel_samples(
        scene,
        root_key,
        pixel_ids,
        sample_idx,
        width=width,
        height=height,
        spp_total=spp,
        max_depth=max_depth,
        unroll_bounces=True,
        detach_sampling=detach,
        mode=mode,
    )
    return sums.reshape(height, width, 3) / spp
