"""Render session driver.

The reference's RenderSession (include/cornelis/Render.hpp:16-49,
src/Render.cpp:267-363) orchestrates TBB tile tasks with progress atomics and
cooperative abort. TPU-native equivalent: the frame is rendered in jitted
sample *chunks* (one device dispatch each); between chunks the host updates
progress, invokes the user callback (same Continue/Abort contract,
Render.hpp:10-14), checkpoints, and logs. Chunked dispatch doubles as the
progressive mode the reference planned (README Milestone 4) -- every chunk
boundary yields a usable partial image.

Differences from the reference, deliberate:
  * RenderProgress is populated (the reference's is an empty struct,
    Render.hpp:15) -- chunks/rays/spp counts plus rays-per-second;
  * the final callback reports Done / Aborted correctly (the reference
    passes Running at completion, Render.cpp:358 -- a quirk we do NOT keep,
    since it's a reporting bug with no effect on pixels).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from enum import Enum
from typing import Callable, Optional

import numpy as np

from .film import Film
from .integrator import render_chunk
from .options import RenderOptions
from .rng import make_key
from .scene.compile import SceneArrays, compile_scene
from .scene.description import SceneDescription
from .utils.logging import log_session_header, logger


class RenderCommand(Enum):
    CONTINUE = "continue"
    ABORT = "abort"


class RenderStatus(Enum):
    RUNNING = "running"
    DONE = "done"
    ABORTED = "aborted"
    FAILED = "failed"


@dataclass
class RenderProgress:
    """Populated progress record (vs the reference's empty struct +
    State::Progress atomics, Render.cpp:277-288)."""

    chunks_target: int = 0
    chunks_completed: int = 0
    primary_rays_target: int = 0
    primary_rays_traced: int = 0
    samples_target: int = 0
    samples_completed: int = 0
    elapsed_seconds: float = 0.0
    rays_per_second: float = 0.0

    @property
    def fraction_complete(self) -> float:
        if self.chunks_target == 0:
            return 0.0
        return self.chunks_completed / self.chunks_target


ProgressCallback = Callable[[RenderProgress, RenderStatus], RenderCommand]


@dataclass
class RenderResult:
    image: np.ndarray  # linear RGB (H, W, 3)
    film: Film
    status: RenderStatus
    progress: RenderProgress = field(default_factory=RenderProgress)


class RenderSession:
    """Compile once, render with progress/abort/checkpoint (Render.hpp:16-49)."""

    def __init__(self, scene: SceneDescription, options: Optional[RenderOptions] = None):
        from .utils.cache import enable_persistent_cache

        enable_persistent_cache()  # megakernel cold compiles cache to disk
        self.options = options or RenderOptions()
        self.options.validate()
        self.scene_description = scene
        self.scene: SceneArrays = compile_scene(scene)

    def render(self, on_progress: Optional[ProgressCallback] = None) -> RenderResult:
        opts = self.options
        log_session_header(opts, self.scene)

        film = Film(opts.width, opts.height)
        next_sample = 0
        if opts.checkpoint:
            try:
                film, next_sample, _ = Film.load_checkpoint(opts.checkpoint)
                logger.info(
                    "Resumed from checkpoint %s at sample %d.",
                    opts.checkpoint,
                    next_sample,
                )
            except FileNotFoundError:
                pass

        key = make_key(opts.seed)
        spp_chunk = opts.resolved_spp_chunk()

        # Backend selection: the Pallas megakernel handles TPU dispatches
        # (uniform or sobol samplers, analytic + SDF primitives, with or
        # without a device mesh -- render_chunk_mesh_pallas runs it under
        # shard_map); the XLA wavefront covers CPU and differentiable mode.
        use_pallas = opts.backend == "pallas"
        if opts.backend == "auto":
            import jax

            use_pallas = jax.default_backend() not in ("cpu",)
        if use_pallas:
            # Build the kernel's host scene tables from the description on
            # the CPU backend and pre-seed the converter memo: the session
            # never does a TPU->host fetch (which can stall minutes over a
            # tunneled device).
            from .ops.pallas_integrator import (
                host_scene_from_description,
                register_host_scene,
            )

            register_host_scene(
                self.scene, host_scene_from_description(self.scene_description)
            )

        mesh = None
        if opts.mesh_shape is not None:
            from .parallel import make_mesh, render_chunk_mesh  # lazy

            mesh = make_mesh(opts.mesh_shape)
            n_samp = opts.mesh_shape[1] if len(opts.mesh_shape) > 1 else 1
            if n_samp > 1:
                # Every chunk must split evenly over the sample axis.
                spp_chunk = max(n_samp, spp_chunk - spp_chunk % n_samp)
                if opts.samples_aa % n_samp != 0:
                    raise ValueError(
                        f"samples_aa ({opts.samples_aa}) must be divisible "
                        f"by the sample mesh axis ({n_samp})"
                    )

        chunk_starts = list(range(next_sample, opts.samples_aa, spp_chunk))

        progress = RenderProgress(
            chunks_target=len(chunk_starts),
            primary_rays_target=opts.width * opts.height * opts.samples_aa,
            samples_target=opts.samples_aa,
            samples_completed=next_sample,
            primary_rays_traced=opts.width * opts.height * next_sample,
        )

        status = RenderStatus.RUNNING
        start = time.perf_counter()
        last_logged_pct = -1.0

        # Without a checkpoint, chunk sums accumulate ON DEVICE and move to
        # the host film once at the end: dispatches pipeline asynchronously
        # (JAX dispatch is async; a per-chunk np.asarray would block the
        # host on every chunk and serialize the device). Checkpointing
        # needs host data per chunk, so it keeps the synchronous path.
        device_accum = None
        accum_samples = 0

        def drain_accumulator():
            nonlocal device_accum, accum_samples
            if device_accum is not None:
                film.add_samples(np.asarray(device_accum), accum_samples)
                device_accum = None
                accum_samples = 0

        for chunk_index, sample_offset in enumerate(chunk_starts):
            this_chunk = min(spp_chunk, opts.samples_aa - sample_offset)
            common = dict(
                width=opts.width,
                height=opts.height,
                spp_chunk=this_chunk,
                spp_total=opts.samples_aa,
                max_depth=opts.max_depth,
                sampler=opts.sampler,
                mode=opts.integrator,
            )
            if mesh is not None:
                if use_pallas:
                    from .parallel import render_chunk_mesh_pallas  # lazy

                    chunk_sum = render_chunk_mesh_pallas(
                        self.scene,
                        key,
                        np.uint32(sample_offset),
                        mesh=mesh,
                        tile_size=opts.tile_size,
                        **common,
                    )
                else:
                    chunk_sum = render_chunk_mesh(
                        self.scene,
                        key,
                        np.uint32(sample_offset),
                        mesh=mesh,
                        tile_size=opts.tile_size,
                        **common,
                    )
            elif use_pallas:
                from .ops.pallas_integrator import render_chunk_pallas  # lazy

                chunk_sum = render_chunk_pallas(
                    self.scene, key, np.uint32(sample_offset), **common
                )
            else:
                chunk_sum = render_chunk(
                    self.scene, key, np.uint32(sample_offset), **common
                )
            if opts.checkpoint:
                film.add_samples(np.asarray(chunk_sum), this_chunk)
            else:
                device_accum = (
                    chunk_sum if device_accum is None else device_accum + chunk_sum
                )
                accum_samples += this_chunk
                if opts.time_budget_s > 0:
                    # Progressive mode meters wall clock, so the chunk must
                    # actually finish before the elapsed check below --
                    # async dispatch would otherwise submit everything in
                    # milliseconds and the budget would never bind.
                    import jax

                    jax.block_until_ready(device_accum)

            progress.chunks_completed = chunk_index + 1
            progress.samples_completed = sample_offset + this_chunk
            progress.primary_rays_traced = (
                opts.width * opts.height * progress.samples_completed
            )
            progress.elapsed_seconds = time.perf_counter() - start
            if progress.elapsed_seconds > 0:
                progress.rays_per_second = (
                    opts.width
                    * opts.height
                    * (progress.samples_completed - next_sample)
                    / progress.elapsed_seconds
                )

            if opts.checkpoint:
                film.save_checkpoint(
                    opts.checkpoint, next_sample=progress.samples_completed, seed=opts.seed
                )

            pct = 100.0 * progress.fraction_complete
            if pct - last_logged_pct >= 5.0 or chunk_index + 1 == len(chunk_starts):
                logger.info(
                    "%.1f%% done.. (%.1f Mrays/s primary)",
                    pct,
                    progress.rays_per_second / 1e6,
                )
                last_logged_pct = pct

            if on_progress is not None:
                if on_progress(progress, RenderStatus.RUNNING) != RenderCommand.CONTINUE:
                    status = RenderStatus.ABORTED
                    break

            # Progressive time budget (the reference's planned "sample for
            # x seconds", README Milestone 4): stop dispatching once the
            # budget elapses; completed chunks stay in the estimate.
            if (
                opts.time_budget_s > 0
                and time.perf_counter() - start >= opts.time_budget_s
                and chunk_index + 1 < len(chunk_starts)
            ):
                logger.info(
                    "Time budget (%.1f s) reached after %d/%d samples.",
                    opts.time_budget_s,
                    progress.samples_completed,
                    opts.samples_aa,
                )
                break

        # Block on the pipelined device work and move it to the host film;
        # recompute the rate over *completed* (not just dispatched) work.
        drain_accumulator()
        progress.elapsed_seconds = time.perf_counter() - start
        if progress.elapsed_seconds > 0:
            progress.rays_per_second = (
                opts.width
                * opts.height
                * (progress.samples_completed - next_sample)
                / progress.elapsed_seconds
            )

        if status != RenderStatus.ABORTED:
            status = RenderStatus.DONE
        else:
            logger.warning("Render was aborted.")

        if on_progress is not None:
            on_progress(progress, status)

        if opts.output:
            logger.info("Saving image to %s.", opts.output)
            film.save_png(opts.output, standard_srgb=opts.standard_srgb)

        return RenderResult(image=film.image(), film=film, status=status, progress=progress)


def render_scene(
    scene: SceneDescription,
    options: Optional[RenderOptions] = None,
    on_progress: Optional[ProgressCallback] = None,
) -> RenderResult:
    """One-shot convenience: RenderSession(...).render() (Render.hpp:33)."""
    return RenderSession(scene, options).render(on_progress)
