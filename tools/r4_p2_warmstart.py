"""Round-4 TPU batch, process 2: the VERDICT r3 #1 'done' measurement.

A FRESH process on a recently-warm device must complete its first chunk at
megakernel throughput in <10 s, and the default 512^2 x 256 spp render
must drop ~4x vs the round-3 all-XLA default (~52 s).

Times, through the PUBLIC RenderSession with DEFAULT options (auto
backend, default warmup/warm-age thresholds):
  * time to first completed chunk,
  * total render wall clock,
  * the backend schedule actually used (expect all-pallas via the warmth
    stamp left by the previous process).

Also measures a forced-XLA session's first-chunk latency with the
populated XLA disk cache (is the ~50 s first-pixels compile recurring?).

Writes /tmp/r4_p2_warmstart.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    assert jax.default_backend() not in ("cpu",), "need the TPU"

    from cornelis_tpu.options import RenderOptions
    from cornelis_tpu.render import RenderCommand, RenderSession
    from cornelis_tpu.scene.library import cornell_box
    from cornelis_tpu.ops import pallas_integrator as pk

    out = {"stamp_recent": pk.device_recently_warm(120.0)}
    print("device_recently_warm(120):", out["stamp_recent"], flush=True)

    first_chunk_t = [None]
    t0 = time.time()

    def on_progress(progress, status):
        if first_chunk_t[0] is None and progress.chunks_completed >= 1:
            first_chunk_t[0] = time.time() - t0
        return RenderCommand.CONTINUE

    opts = RenderOptions(output=None)  # all defaults: 512^2, 256 spp, auto
    session = RenderSession(cornell_box(), opts)
    t0 = time.time()
    result = session.render(on_progress)
    total = time.time() - t0
    out.update(
        {
            "default_render_total_s": round(total, 2),
            "first_chunk_completed_s": round(first_chunk_t[0], 2)
            if first_chunk_t[0]
            else None,
            "backend_schedule": list(result.backend_schedule),
            "status": str(result.status),
            "mrays_per_s": round(
                512 * 512 * 256 / total / 1e6, 1
            ),
        }
    )
    print(json.dumps(out), flush=True)

    # Forced-XLA first-chunk latency with the populated disk cache: the
    # round-3 assumption was ~50 s of XLA compile before first pixels; if
    # the persistent cache eliminates it, the auto path's cold-device
    # serve-on-XLA phase starts in seconds too.
    first_chunk_t[0] = None
    opts = RenderOptions(output=None, backend="xla")
    session = RenderSession(cornell_box(), opts)
    t0 = time.time()

    def on_progress2(progress, status):
        if first_chunk_t[0] is None and progress.chunks_completed >= 1:
            first_chunk_t[0] = time.time() - t0
            return RenderCommand.ABORT  # only the first chunk matters
        return RenderCommand.CONTINUE

    result = session.render(on_progress2)
    out["xla_first_chunk_cached_s"] = round(first_chunk_t[0], 2) if first_chunk_t[0] else None
    out["xla_status"] = str(result.status)

    with open("/tmp/r4_p2_warmstart.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)
    print("P2 DONE", flush=True)


if __name__ == "__main__":
    main()
