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
    Render.hpp:15) -- chunks/rays/spp counts plus rays-per-second, and the
    counts track chunks the device has COMPLETED, not merely dispatched
    (dispatch is async; a watcher thread fetches a 4-byte completion probe
    per chunk, utils/barrier.py);
  * the final callback reports Done / Aborted correctly (the reference
    passes Running at completion, Render.cpp:358 -- a quirk we do NOT keep,
    since it's a reporting bug with no effect on pixels).

Backend scheduling (the "auto" backend on TPU): the Pallas megakernel is
2-4x the XLA wavefront's throughput once running, but the FIRST Pallas
execution in a process pays a device-side initialization measured at 2-6
minutes over a tunneled TPU (PERF.md), and any work dispatched after it
queues behind it (the device stream is FIFO) -- so "warm up concurrently
while serving XLA chunks" is physically impossible on this transport. The
session therefore serves chunks on the XLA path immediately (first pixels in
seconds) while measuring COMPLETED throughput, and switches every remaining
chunk to Pallas only if the estimated time left on XLA exceeds
`warmup_threshold_s` -- i.e. only when the remaining work is big enough to
amortize the one-time init. Once any megakernel has completed in the
process, auto mode starts on Pallas directly (subsequent executables start
in ~2 s).
"""

from __future__ import annotations

import os
import threading
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
    State::Progress atomics, Render.cpp:277-288).

    `*_completed` / `*_traced` count work the device has FINISHED (verified
    by a completion probe), not work merely dispatched; `chunks_dispatched`
    exposes the async-dispatch frontier separately.
    """

    chunks_target: int = 0
    chunks_completed: int = 0
    chunks_dispatched: int = 0
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
    # Which backend each dispatched chunk ran on ("xla" / "pallas"), in
    # dispatch order. Auto-mode switchover depends on wall clock, so this
    # is the record that makes an auto render reproducible: feed it back
    # via RenderOptions.backend_schedule to replay the identical schedule
    # (and therefore identical pixels) without re-timing anything.
    backend_schedule: tuple = ()


class _CompletionTracker:
    """Counts chunks the device has actually finished.

    Dispatch is async (and jax.block_until_ready lies on the tunneled axon
    backend -- utils/barrier.py), so per-chunk completion is observed by
    fetching a 4-byte scalar probe of each chunk's result on a watcher
    thread: the fetch returns only when the device produced the sum. The
    main loop keeps dispatching at full speed; progress numbers lag reality
    by at most the one probe currently being fetched.
    """

    def __init__(self):
        self._lock = threading.Condition()
        self._pending: list = []  # FIFO of (num_samples, probe)
        self._chunks = 0
        self._samples = 0
        self._submitted = 0
        self._times: list = []  # completion wall-clock stamps
        self._sample_counts: list = []
        self._error: Optional[BaseException] = None
        self._thread: Optional[threading.Thread] = None

    def track(self, chunk_sum, num_samples: int) -> None:
        from .utils.barrier import completion_probe

        probe = completion_probe(chunk_sum)
        with self._lock:
            self._pending.append((num_samples, probe))
            self._submitted += 1
            self._lock.notify_all()
            # Thread creation inside the lock: a check outside would let
            # concurrent first track() calls each spawn a watcher while
            # close() enqueues only one sentinel.
            if self._thread is None:
                self._thread = threading.Thread(
                    target=self._watch, daemon=True, name="cornelis-completion"
                )
                self._thread.start()

    def _watch(self) -> None:
        while True:
            with self._lock:
                while not self._pending:
                    self._lock.wait()
                if self._pending[0] is None:  # close() sentinel
                    return
                # COALESCE the backlog: the device stream is FIFO on this
                # transport (PERF.md section 1 point 3), so the NEWEST
                # pending probe's completion implies every earlier chunk
                # completed too -- fetch one probe, credit the whole
                # batch. Without this, each probe pays a full tunnel
                # round-trip (measured ~0.4-1.5 s regardless of payload)
                # and a 64-chunk render drains probes for ~100 s while the
                # device finished in ~4 (round-4 gallery-render regression,
                # fixed here). When chunks complete slower than the probe
                # round-trip the batch size is 1 and per-chunk granularity
                # is preserved. The FIFO assumption is per device stream --
                # it covers mixed XLA and Pallas executables on THIS
                # transport (measured); a runtime that reorders streams
                # would over-credit progress. CORNELIS_DEBUG_FIFO_PROBES=1
                # turns on a per-batch spot check of that assumption.
                batch = []
                while self._pending and self._pending[0] is not None:
                    batch.append(self._pending.pop(0))
            probe = batch[-1][1]
            try:
                float(np.asarray(probe))  # blocks until the device is done
                if len(batch) > 1 and os.environ.get(
                    "CORNELIS_DEBUG_FIFO_PROBES"
                ):
                    # Debug mode: the FIFO premise says the OLDEST probe in
                    # the batch must also be done by now. is_ready() is a
                    # non-blocking runtime query where available; fall back
                    # to a timed fetch (near-instant when FIFO holds).
                    oldest = batch[0][1]
                    ready = getattr(oldest, "is_ready", None)
                    if ready is not None and not ready():
                        logger.warning(
                            "FIFO probe assumption violated: newest probe "
                            "resolved before the oldest of %d queued chunks "
                            "-- completion credits may over-report",
                            len(batch),
                        )
            except Exception as exc:  # pragma: no cover - device failure
                with self._lock:
                    self._error = exc
                    self._lock.notify_all()
                return
            num_samples = sum(n for n, _ in batch)
            with self._lock:
                self._chunks += len(batch)
                self._samples += num_samples
                self._times.append(time.perf_counter())
                self._sample_counts.append(num_samples)
                self._lock.notify_all()

    def counts(self) -> tuple:
        with self._lock:
            return self._chunks, self._samples

    def all_done(self) -> bool:
        with self._lock:
            return self._chunks == self._submitted

    def wait(self, timeout: Optional[float] = None) -> bool:
        """Wait until every tracked chunk completed; False on timeout."""
        deadline = None if timeout is None else time.perf_counter() + timeout
        with self._lock:
            while self._chunks < self._submitted and self._error is None:
                remaining = (
                    None if deadline is None else deadline - time.perf_counter()
                )
                if remaining is not None and remaining <= 0:
                    return False
                self._lock.wait(timeout=remaining)
            if self._error is not None:
                raise self._error
            return True

    def wait_for_inflight_below(self, limit: int) -> None:
        """Block until fewer than `limit` tracked chunks are in flight."""
        with self._lock:
            while (
                self._submitted - self._chunks >= limit and self._error is None
            ):
                self._lock.wait()
            if self._error is not None:
                raise self._error

    def close(self) -> None:
        with self._lock:
            self._pending.append(None)
            self._lock.notify_all()

    def steady_rate(self, rays_per_sample: int) -> Optional[float]:
        """Completed rays/s measured AFTER the first completed chunk (the
        first one absorbs the XLA compile, which would bias the estimate).
        None until two chunks have completed."""
        with self._lock:
            if len(self._times) < 2:
                return None
            dt = self._times[-1] - self._times[0]
            if dt <= 0:
                return None
            samples = sum(self._sample_counts[1:])
            return samples * rays_per_sample / dt


class RenderSession:
    """Compile once, render with progress/abort/checkpoint (Render.hpp:16-49)."""

    def __init__(self, scene: SceneDescription, options: Optional[RenderOptions] = None):
        from .utils.cache import enable_persistent_cache

        enable_persistent_cache()  # persist XLA compiles across processes
        self.options = options or RenderOptions()
        self.options.validate()
        self.scene_description = scene
        self.scene: SceneArrays = compile_scene(scene)

    def _fetch(self, device_array) -> np.ndarray:
        """Host numpy from a device array that may be globally sharded
        across processes (multi-host mesh): per-host shards are
        all-gathered so every process assembles the full frame (the
        reference's TBB pool writes disjoint regions of one shared buffer,
        src/Render.cpp:335-354; across hosts that buffer must be gathered)."""
        import jax

        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            device_array = multihost_utils.process_allgather(
                device_array, tiled=True
            )
        return np.asarray(device_array)

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

        # Backend selection. The Pallas megakernel handles TPU dispatches
        # (both samplers, analytic + SDF primitives, path and NEE modes,
        # with or without a device mesh); the XLA wavefront covers CPU and
        # differentiable mode, and serves the leading chunks of auto-mode
        # TPU sessions until the megakernel is warm (module docstring).
        import jax

        # Cross-rank control flow: in a multi-process job, every rank must
        # take the SAME backend / abort / time-budget branch -- a rank
        # leaving the chunk loop one iteration early (or dispatching a
        # different sharded executable) while others continue deadlocks the
        # collectives. Rank 0's local decision is broadcast and adopted;
        # every rank must reach each agree() call the same number of times.
        multihost = jax.process_count() > 1

        def agree(decision: bool) -> bool:
            if not multihost:
                return decision
            from jax.experimental import multihost_utils

            return bool(
                multihost_utils.broadcast_one_to_all(
                    np.asarray(decision, dtype=np.bool_)
                )
            )

        on_accelerator = jax.default_backend() not in ("cpu",)
        force_pallas = opts.backend == "pallas"
        auto_pallas = opts.backend == "auto" and on_accelerator
        if force_pallas or auto_pallas:
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
            from .parallel import make_mesh  # lazy

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
        rays_per_sample = opts.width * opts.height

        progress = RenderProgress(
            chunks_target=len(chunk_starts),
            primary_rays_target=rays_per_sample * opts.samples_aa,
            samples_target=opts.samples_aa,
            samples_completed=next_sample,
            primary_rays_traced=rays_per_sample * next_sample,
        )

        status = RenderStatus.RUNNING
        start = time.perf_counter()
        last_logged_pct = -1.0
        tracker = _CompletionTracker()

        def dispatch(sample_offset: int, this_chunk: int, pallas: bool):
            common = dict(
                width=opts.width,
                height=opts.height,
                spp_chunk=this_chunk,
                spp_total=opts.samples_aa,
                max_depth=opts.max_depth,
                sampler=opts.sampler,
                mode=opts.integrator,
                nee_clamp=opts.nee_clamp,
            )
            if mesh is not None:
                if pallas:
                    from .parallel import render_chunk_mesh_pallas  # lazy

                    return render_chunk_mesh_pallas(
                        self.scene, key, np.uint32(sample_offset),
                        mesh=mesh, tile_size=opts.tile_size, **common,
                    )
                from .parallel import render_chunk_mesh  # lazy

                return render_chunk_mesh(
                    self.scene, key, np.uint32(sample_offset),
                    mesh=mesh, tile_size=opts.tile_size, **common,
                )
            if pallas:
                from .ops.pallas_integrator import render_chunk_pallas  # lazy

                return render_chunk_pallas(
                    self.scene, key, np.uint32(sample_offset), **common
                )
            return render_chunk(
                self.scene, key, np.uint32(sample_offset), **common
            )

        def update_progress() -> None:
            done_chunks, done_samples = tracker.counts()
            progress.chunks_completed = done_chunks
            progress.samples_completed = next_sample + done_samples
            progress.primary_rays_traced = (
                rays_per_sample * progress.samples_completed
            )
            progress.elapsed_seconds = time.perf_counter() - start
            if progress.elapsed_seconds > 0:
                progress.rays_per_second = (
                    rays_per_sample * done_samples / progress.elapsed_seconds
                )

        def maybe_log() -> None:
            nonlocal last_logged_pct
            pct = 100.0 * progress.fraction_complete
            if pct - last_logged_pct >= 5.0 or (
                pct >= 100.0 and last_logged_pct < 100.0
            ):
                logger.info(
                    "%.1f%% done.. (%.1f Mrays/s primary)",
                    pct,
                    progress.rays_per_second / 1e6,
                )
                last_logged_pct = pct

        # Replayed schedule (RenderOptions.backend_schedule): adaptive
        # decisions are skipped entirely and each chunk runs on the
        # recorded backend -- wall-clock-independent, so the replay is
        # bit-identical to the recorded run.
        replay = opts.backend_schedule
        if replay is not None:
            replay = tuple(replay)
            if len(replay) != len(chunk_starts):
                raise ValueError(
                    f"backend_schedule has {len(replay)} entries but this "
                    f"render dispatches {len(chunk_starts)} chunks "
                    f"(samples_aa={opts.samples_aa}, spp_chunk={spp_chunk}, "
                    f"resume offset={next_sample})."
                )
            if any(b == "pallas" for b in replay) and not (
                force_pallas or auto_pallas
            ):
                raise ValueError(
                    "backend_schedule contains 'pallas' chunks but the "
                    "session backend/platform cannot dispatch the "
                    "megakernel (backend must be 'auto' on an accelerator "
                    "or 'pallas')."
                )

        # Pallas scheduling state (module docstring). Once the process is
        # warm (or the device itself was exercised recently -- warmth
        # outlives processes, PERF.md), auto mode starts on Pallas
        # directly. The check is per-process/per-host state, so in a
        # multi-process job rank 0's answer is broadcast (every rank must
        # dispatch the same sharded executable).
        from .ops import pallas_integrator as _pk

        device_warm = auto_pallas and agree(
            _pk.device_recently_warm(opts.warm_device_max_age_s)
        )
        if device_warm and not _pk.process_is_warm():
            logger.info(
                "Auto backend: device completed a Pallas kernel within the "
                "last %.0f s (warmth stamp) -- starting on the megakernel.",
                opts.warm_device_max_age_s,
            )
        use_pallas = force_pallas or device_warm
        switch_logged = False
        decision_open = (
            replay is None
            and auto_pallas
            and not use_pallas
            and opts.warmup_threshold_s >= 0
        )
        if auto_pallas and not use_pallas and replay is None and len(chunk_starts) > 1:
            if opts.warmup_threshold_s < 0:
                logger.info(
                    "Auto backend: serving every chunk on the XLA path "
                    "(warmup_threshold_s < 0 disables the Pallas switchover)."
                )
            else:
                logger.info(
                    "Auto backend: serving chunks on the XLA path; will "
                    "switch to the Pallas megakernel %s (its once-per-"
                    "process device warmup costs minutes over a tunneled "
                    "TPU -- PERF.md).",
                    "immediately (warmup_threshold_s = 0)"
                    if opts.warmup_threshold_s == 0
                    else "if the estimated remaining render time exceeds "
                    f"{opts.warmup_threshold_s:.0f} s",
                )

        # Without a checkpoint, chunk sums accumulate ON DEVICE and move to
        # the host film once at the end: dispatches pipeline asynchronously
        # (a per-chunk np.asarray would block the host on every chunk and
        # serialize the device). Checkpointing needs host data per chunk,
        # so it keeps the synchronous path.
        device_accum = None
        accum_samples = 0
        schedule: list = []

        for chunk_index, sample_offset in enumerate(chunk_starts):
            # Adaptive switchover: measure COMPLETED XLA throughput; if the
            # time left at that rate exceeds the threshold, the remaining
            # chunks are worth the megakernel's one-time init. While the
            # decision is open, dispatch is throttled to a short in-flight
            # window -- unthrottled async dispatch would submit the whole
            # render before the first completion arrives and the decision
            # could never trigger. (Depth 3 still overlaps host and device;
            # once decided -- or on forced backends -- dispatch is
            # unthrottled and chunks pipeline freely.)
            #
            # The flip is rank-agreed: steady_rate() is local wall-clock
            # state, and ranks flipping at different chunk indices would
            # dispatch different sharded executables for the same global
            # chunk (the divergent-branch deadlock above). `decision_open`
            # is identical on every rank, so each rank reaches this
            # agree() the same number of times.
            if decision_open and not use_pallas:
                tracker.wait_for_inflight_below(3)
                remaining_samples = opts.samples_aa - sample_offset
                if opts.warmup_threshold_s == 0:
                    est = float("inf")
                else:
                    rate = tracker.steady_rate(rays_per_sample)
                    est = (
                        remaining_samples * rays_per_sample / rate
                        if rate
                        else None
                    )
                if agree(est is not None and est > opts.warmup_threshold_s):
                    use_pallas = True
                    if not switch_logged:
                        switch_logged = True
                        logger.info(
                            "%s -- switching the remaining %d chunks to "
                            "the Pallas megakernel (they will queue behind "
                            "its one-time device warmup).",
                            "Immediate switchover requested "
                            "(warmup_threshold_s = 0)"
                            if est == float("inf")
                            else "Rank 0 estimated enough remaining work"
                            if est is None  # rank != 0; agreed via rank 0
                            else f"Estimated {est:.0f} s of work left on "
                            "the XLA path",
                            len(chunk_starts) - chunk_index,
                        )

            if replay is not None:
                use_pallas = replay[chunk_index] == "pallas"
            this_chunk = min(spp_chunk, opts.samples_aa - sample_offset)
            chunk_sum = dispatch(sample_offset, this_chunk, use_pallas)
            schedule.append("pallas" if use_pallas else "xla")
            tracker.track(chunk_sum, this_chunk)
            progress.chunks_dispatched = chunk_index + 1

            if opts.checkpoint:
                film.add_samples(self._fetch(chunk_sum), this_chunk)
                # Rank 0 writes (every rank holds the full film after
                # _fetch); concurrent writers would interleave in the same
                # tmp file.
                if jax.process_index() == 0:
                    film.save_checkpoint(
                        opts.checkpoint,
                        next_sample=sample_offset + this_chunk,
                        seed=opts.seed,
                    )
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
                    tracker.wait()

            update_progress()
            maybe_log()

            # The abort collective runs on EVERY rank each iteration, even
            # ranks without a callback: installing on_progress on a subset
            # of ranks (rank 0 only is natural) must not leave the others
            # skipping the broadcast that rank 0 initiates.
            if on_progress is not None or multihost:
                want_abort = on_progress is not None and (
                    on_progress(progress, RenderStatus.RUNNING)
                    != RenderCommand.CONTINUE
                )
                if agree(want_abort):
                    status = RenderStatus.ABORTED
                    break

            # Progressive time budget (the reference's planned "sample for
            # x seconds", README Milestone 4): stop dispatching once the
            # budget elapses; completed chunks stay in the estimate. Rank
            # 0's clock decides for every rank (see `agree`).
            if (
                opts.time_budget_s > 0
                and chunk_index + 1 < len(chunk_starts)
                and agree(time.perf_counter() - start >= opts.time_budget_s)
            ):
                logger.info(
                    "Time budget (%.1f s) reached after %d/%d samples.",
                    opts.time_budget_s,
                    progress.samples_completed,
                    opts.samples_aa,
                )
                break

        # Everything is dispatched; report honest progress while the device
        # works through the queue (the percent lines during this phase are
        # what the reference's per-tile progress atomics provide,
        # Render.cpp:344-353).
        # The drain loop's iteration count is timing-dependent and differs
        # across ranks, so it must stay collective-free: an abort here is
        # noted locally and rank-agreed ONCE after the loop (aborting
        # during drain only affects reporting -- dispatched work cannot be
        # recalled anyway).
        drain_abort = False
        while status == RenderStatus.RUNNING and not tracker.all_done():
            if tracker.wait(timeout=0.25):
                break
            update_progress()
            maybe_log()
            if on_progress is not None:
                if on_progress(progress, RenderStatus.RUNNING) != RenderCommand.CONTINUE:
                    # Dispatched work cannot be recalled; stop waiting and
                    # drain what exists.
                    drain_abort = True
                    break

        # Move the device accumulator to the host film (blocks until the
        # remaining device work completes), then recompute the rate over
        # *completed* work.
        if device_accum is not None:
            film.add_samples(self._fetch(device_accum), accum_samples)
            device_accum = None
        if (on_progress is not None or multihost) and agree(drain_abort):
            status = RenderStatus.ABORTED
        if not tracker.wait(timeout=60.0):
            # _fetch above already blocked on the film data, so a straggling
            # probe here is a tunnel anomaly, not missing work -- but the
            # final counters below would under-report, so say so.
            logger.warning(
                "Completion probes still pending 60 s after the film "
                "arrived; final progress counters may under-report."
            )
        tracker.close()
        update_progress()
        maybe_log()
        if use_pallas and tracker.all_done():
            _pk.mark_process_warm()

        if status != RenderStatus.ABORTED:
            status = RenderStatus.DONE
        else:
            logger.warning("Render was aborted.")

        if on_progress is not None:
            on_progress(progress, status)

        if opts.output and jax.process_index() == 0:
            logger.info("Saving image to %s.", opts.output)
            film.save_png(opts.output, standard_srgb=opts.standard_srgb)

        return RenderResult(
            image=film.image(),
            film=film,
            status=status,
            progress=progress,
            backend_schedule=tuple(schedule),
        )


def render_scene(
    scene: SceneDescription,
    options: Optional[RenderOptions] = None,
    on_progress: Optional[ProgressCallback] = None,
) -> RenderResult:
    """One-shot convenience: RenderSession(...).render() (Render.hpp:33)."""
    return RenderSession(scene, options).render(on_progress)
