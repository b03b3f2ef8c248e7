"""Mesh-sharded differentiable training step.

The inverse-render optimization (inverse.py) scaled over a device mesh:
the forward render shards pixels over `tiles` and samples over `samples`
(parallel/render.py); reverse-mode differentiation through the shard_map
transposes the `samples`-axis psum into a broadcast and turns the
replicated scene parameters' cotangents into a cross-device psum -- the
all-reduce-of-gradients pattern, arising from sharding structure rather
than hand-written NCCL calls (SURVEY.md section 5 "distributed backend").
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from ..parallel.render import render_chunk_mesh
from ..scene.compile import SceneArrays
from .inverse import apply_params, extract_params

Array = jnp.ndarray


def make_sharded_train_step(
    base_scene: SceneArrays,
    target: Array,
    mesh: Mesh,
    optimizer,
    *,
    width: int,
    height: int,
    spp: int,
    max_depth: int = 8,
    mode: str = "path",
    detach: bool = True,
):
    """Build a jitted (params, opt_state, key) -> (params, opt_state, loss)
    step whose forward render runs as a shard_map over `mesh`.

    Dual-buffer loss (see inverse.make_loss) with both renders sharded.
    mode="nee" shards the next-event-estimation estimator (round 5);
    detach=True (default) uses the production detached-sampling estimator,
    matching the single-device render_diff (rounds <= 4 differentiated the
    fully-attached estimator here -- higher-variance gradients for no
    benefit outside FD tests).
    """

    def render(scene, key):
        img = render_chunk_mesh(
            scene,
            key,
            jnp.uint32(0),
            mesh=mesh,
            width=width,
            height=height,
            spp_chunk=spp,
            spp_total=spp,
            max_depth=max_depth,
            unroll_bounces=True,
            mode=mode,
            detach_sampling=detach,
        )
        return img / spp

    def loss_fn(params: Dict[str, Any], key: Array) -> Array:
        scene = apply_params(base_scene, params)
        ka, kb = jax.random.split(key)
        a = render(scene, ka) - target
        b = render(scene, kb) - target
        return jnp.mean(a * b)

    @jax.jit
    def train_step(params, opt_state, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step
