"""Render options.

The reference exposes a single knob, samplesAA (default 256,
include/cornelis/RenderOptions.hpp:6-16), and hardcodes everything else:
512x512 resolution (Render.cpp:307), 32x32 tiles (Render.cpp:327), the
output path (Render.cpp:264). We lift all of those into configuration, with
the reference's values as defaults.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from .rng import DEFAULT_SEED


@dataclass
class RenderOptions:
    # Reference knob + default (RenderOptions.hpp:7).
    samples_aa: int = 256
    # Hardcoded in the reference; lifted here with identical defaults.
    width: int = 512
    height: int = 512
    # Max bounce depth: the reference loops until RR kills every path
    # (Render.cpp:237-243); under jit we bound the while_loop. RR survival
    # after depth 3 is <= 0.55, so P(alive at 64) < 1e-16 -- the truncation
    # bias is far below MC noise.
    max_depth: int = 64
    seed: int = DEFAULT_SEED
    # Samples dispatched per device call (progress/abort/checkpoint grain).
    # 0 = auto-size to ~2M rays per dispatch.
    spp_chunk: int = 0
    # Output path; None = don't save. Reference hardcodes
    # "cornelisrender2.png" (Render.cpp:264).
    output: Optional[str] = "cornelisrender2.png"
    # Use the standard sRGB 12.92 linear slope instead of the reference's
    # 12.95 quirk (src/Color.cpp:47,68).
    standard_srgb: bool = False
    # Checkpoint file updated after every chunk; None disables.
    checkpoint: Optional[str] = None
    # Device-mesh shape (tiles, samples); None = single-device dispatch.
    # The TPU-native replacement for the reference's TBB tile pool
    # (Render.cpp:335-354): pixels shard over `tiles`, spp over `samples`.
    mesh_shape: Optional[tuple] = None
    # Image-tile edge for the mesh pixel sharding (FrameTiling as a
    # sharding spec; the reference's 32x32 parallel grain, Render.cpp:327).
    # 0 = flat row-band split. Ignored without mesh_shape.
    tile_size: int = 32
    # Sample sequence: "uniform" (threefry; the reference's pseudo-random
    # sampling in distribution) or "sobol" (Owen-scrambled low-discrepancy;
    # the reference's planned QMC milestone, Sampling.hpp placeholder).
    sampler: str = "uniform"
    # Compute backend: "auto" uses the Pallas VMEM-resident megakernel on
    # TPU (it supports both samplers, SDFs, NEE, and mesh sharding) but
    # serves leading chunks on the XLA wavefront until the megakernel's
    # once-per-process device warmup finishes (minutes over a tunneled
    # device -- PERF.md); "xla" / "pallas" force a single path (and stay
    # bit-deterministic across runs, which "auto" trades away at the
    # timing-dependent switchover chunk). CPU always renders via XLA.
    backend: str = "auto"
    # Auto-backend switchover bar, in seconds (see render.py module
    # docstring): while the process's Pallas megakernel is cold, chunks are
    # served on the XLA path; if the estimated time left at the measured
    # (completed-work) XLA rate exceeds this threshold, every remaining
    # chunk switches to the megakernel -- the remaining work then amortizes
    # its one-time multi-minute device warmup (PERF.md). 0 switches
    # immediately (pay the warmup up front); negative never switches.
    # Ignored by forced backends and on CPU.
    warmup_threshold_s: float = 600.0
    # Auto backend warm-start window: device-side Pallas warmth OUTLIVES
    # the process (PERF.md "Cross-process warmth decay"), so every
    # completed megakernel stamps a per-device tmp file and a NEW process
    # whose device completed one within this many seconds starts auto
    # renders directly on the megakernel (skipping the serve-on-XLA
    # phase). 0 disables the cross-process check. Round-4 measurement
    # (PERF.md): a cold process ran warm_pallas in 1.3 s SIXTY-EIGHT
    # MINUTES after the previous process exited -- warmth survives at
    # least an hour on this transport, so the window defaults to one
    # hour. Mis-prediction cost is bounded: a false-warm start just waits
    # the init the auto path would otherwise have paid at switchover.
    warm_device_max_age_s: float = 3600.0
    # Integrator estimator: "path" replicates the reference exactly
    # (emission at every hit, no light sampling, the quirky averaged
    # layered pdf -- required for golden match); "nee" is the corrected
    # extension (MIS-combined next-event estimation toward emissive
    # spheres AND rectangle planes + the true sampler density) --
    # unbiased apart from the bounded firefly clamp (see nee_clamp),
    # typically orders of magnitude lower variance for small lights.
    # Supported by both the XLA wavefront and the Pallas megakernel.
    integrator: str = "path"
    # NEE firefly clamp: per-channel ceiling on any single bounce's
    # radiance contribution in nee mode (depth-0 emitter sightings exempt).
    # None = scale-aware default, NEE_CLAMP_FACTOR (16) x the scene's
    # brightest emission channel (floored at 1) -- see
    # integrator.auto_nee_clamp. A float overrides with an absolute
    # ceiling; math.inf disables clamping (fully unbiased NEE, fireflies
    # included). Ignored in path mode (never clamped).
    nee_clamp: Optional[float] = None
    # Progressive mode: stop dispatching new sample chunks once this many
    # seconds have elapsed (the reference's planned "sample for x seconds",
    # README Milestone 4). The image normalizes by the samples actually
    # taken; combine with `checkpoint` to keep refining across runs.
    # 0 = no time budget (render all samples_aa).
    time_budget_s: float = 0.0
    # Replay a recorded per-chunk backend schedule (RenderResult
    # .backend_schedule from a previous run): a sequence of "xla"/"pallas"
    # entries, one per dispatched chunk. Auto mode's live switchover
    # depends on wall clock; replaying the recorded schedule reproduces an
    # auto render bit-exactly. None = decide live.
    backend_schedule: Optional[tuple] = None

    def validate(self) -> None:
        if self.samples_aa <= 0:
            raise ValueError(f"AA Samples must be > 0 (not {self.samples_aa}).")
        if self.width <= 0 or self.height <= 0:
            raise ValueError("Resolution must be positive.")
        if self.max_depth <= 0:
            raise ValueError("max_depth must be positive.")
        if self.tile_size < 0:
            raise ValueError("tile_size must be >= 0 (0 = flat split).")
        if self.time_budget_s < 0:
            raise ValueError("time_budget_s must be >= 0 (0 = unlimited).")
        if self.sampler not in ("uniform", "sobol"):
            raise ValueError(
                f"sampler must be 'uniform' or 'sobol' (not {self.sampler!r})."
            )
        if self.backend not in ("auto", "xla", "pallas"):
            raise ValueError(
                f"backend must be auto, xla, or pallas (not {self.backend!r})."
            )
        if self.integrator not in ("path", "nee"):
            raise ValueError(
                f"integrator must be 'path' or 'nee' (not {self.integrator!r})."
            )
        if self.warm_device_max_age_s < 0:
            raise ValueError(
                "warm_device_max_age_s must be >= 0 (0 disables the "
                "cross-process warmth check)."
            )
        if self.nee_clamp is not None and not self.nee_clamp > 0:
            raise ValueError(
                f"nee_clamp must be > 0 (math.inf disables clamping; None "
                f"selects the scale-aware default), not {self.nee_clamp}."
            )
        if self.backend_schedule is not None:
            bad = [b for b in self.backend_schedule if b not in ("xla", "pallas")]
            if bad:
                raise ValueError(
                    f"backend_schedule entries must be 'xla' or 'pallas' "
                    f"(got {bad[:3]!r})."
                )
            if self.backend == "xla" and "pallas" in self.backend_schedule:
                raise ValueError(
                    "backend_schedule contains 'pallas' chunks but "
                    "backend='xla' forces the wavefront."
                )
            if self.backend == "pallas" and "xla" in self.backend_schedule:
                raise ValueError(
                    "backend_schedule contains 'xla' chunks but "
                    "backend='pallas' forces the megakernel (replay a "
                    "mixed schedule with backend='auto')."
                )


    def resolved_spp_chunk(self) -> int:
        if self.spp_chunk > 0:
            return min(self.spp_chunk, self.samples_aa)
        # Auto chunk size: big enough to amortize dispatch overhead, small
        # enough for responsive progress/abort. TPU sustains much larger
        # dispatches than CPU (the megakernel keeps paths VMEM-resident),
        # so target 8M rays there vs 2M on host platforms.
        try:
            import jax

            on_accel = jax.default_backend() not in ("cpu",)
        except Exception:  # pragma: no cover - jax always present
            on_accel = False
        target_rays = (8 if on_accel else 2) * 1024 * 1024
        chunk = max(1, target_rays // (self.width * self.height))
        return min(chunk, self.samples_aa)
