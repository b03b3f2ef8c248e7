"""Error at equal WALL CLOCK for the estimator/sampler modes.

README claims the NEE extension reaches ">=4x lower variance at equal spp";
what a user actually cares about is error at equal *seconds*, since NEE
pays a second in-kernel intersection pass per bounce (shadow rays) and
sobol pays a per-draw scramble loop (VERDICT r2 #5). This tool measures
both factors on the live backend and combines them:

  * truth: Cornell at 256x256, nee+sobol, TRUTH_SPP samples;
  * per config (integrator x sampler): render PROBE_SPP samples, compute
    the per-pixel MSE against truth over unclipped pixels, and time the
    steady-state throughput (spp/s) of the same executable;
  * RMSE at T seconds = sqrt(MSE_probe * PROBE_SPP / (spp_per_s * T))
    (Monte-Carlo error scales as 1/sqrt(samples); samples = spp_per_s * T).

Writes one JSON line per config; paste the table into README.md.

Run on a TPU host:  python tools/equal_time_error.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

W = H = 256
TRUTH_SPP = 16384
PROBE_SPP = 256
CHUNK = 128
MAX_DEPTH = 64
EQUAL_TIME_S = 1.0


def main() -> None:
    import jax
    import numpy as np

    from cornelis_tpu.integrator import render_chunk
    from cornelis_tpu.rng import make_key
    from cornelis_tpu.scene.compile import compile_scene
    from cornelis_tpu.scene.library import cornell_box
    from cornelis_tpu.utils.barrier import device_barrier

    on_tpu = jax.default_backend() not in ("cpu",)
    if on_tpu:
        from cornelis_tpu.ops.pallas_integrator import (
            host_scene_from_description,
            register_host_scene,
            render_chunk_pallas,
        )

    scene = compile_scene(cornell_box())
    if on_tpu:
        register_host_scene(scene, host_scene_from_description(cornell_box()))
    key = make_key()
    truth_key = make_key(421117)  # independent stream for the truth render

    def render(spp, *, sampler, mode, k, chunk=CHUNK):
        fn = render_chunk_pallas if on_tpu else render_chunk
        acc = None
        for off in range(0, spp, chunk):
            out = fn(
                scene,
                k,
                np.uint32(off),
                width=W,
                height=H,
                spp_chunk=min(chunk, spp - off),
                spp_total=spp,
                max_depth=MAX_DEPTH,
                sampler=sampler,
                mode=mode,
            )
            acc = out if acc is None else acc + out
        return np.asarray(device_barrier(acc)) / spp

    t0 = time.time()
    truth = render(TRUTH_SPP, sampler="sobol", mode="nee", k=truth_key)
    print(f"truth ({TRUTH_SPP} spp nee+sobol): {time.time() - t0:.1f} s", flush=True)
    # Exclude pixels where truth itself is extreme (the light disc): their
    # clamped display values don't drive perceived noise.
    mask = truth.max(axis=-1) < 2.0

    for mode in ("path", "nee"):
        for sampler in ("uniform", "sobol"):
            img = render(PROBE_SPP, sampler=sampler, mode=mode, k=key)
            mse = float(((img - truth) ** 2)[mask].mean())

            # Steady-state spp/s: re-render the probe's OWN spp so the same
            # (already-compiled) executable is timed -- a different
            # spp_total would compile a fresh executable and fold ~2 s of
            # local compile into the rate (round-2 bug).
            t0 = time.time()
            render(PROBE_SPP, sampler=sampler, mode=mode, k=key)
            dt = time.time() - t0
            spp_per_s = PROBE_SPP / dt

            rmse_equal_time = (
                mse * PROBE_SPP / (spp_per_s * EQUAL_TIME_S)
            ) ** 0.5
            print(
                json.dumps(
                    {
                        "mode": mode,
                        "sampler": sampler,
                        "mse_at_probe_spp": round(mse, 8),
                        "probe_spp": PROBE_SPP,
                        "spp_per_s": round(spp_per_s, 1),
                        "mrays_per_s": round(spp_per_s * W * H / 1e6, 1),
                        "rmse_at_1s": round(rmse_equal_time, 5),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
