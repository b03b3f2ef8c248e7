"""Round-4 TPU batch, process 1: warm the device, run the (redone)
equal-wall-clock measurement, and locate the sobol NEE firefly.

Writes:
  /tmp/r4_p1_equal_time.jsonl  -- tools/equal_time_error.py output lines
  /tmp/r4_p1_firefly.json      -- brightest unclamped-NEE pixels at 512^2
  /tmp/r4_p1_timings.json      -- stage wall-clock log

Run:  python tools/r4_p1_warm_equal_firefly.py   (on the TPU host)
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

timings = {}


def stage(name):
    class _T:
        def __enter__(self):
            self.t0 = time.time()
            print(f"[stage] {name} ...", flush=True)

        def __exit__(self, *a):
            timings[name] = round(time.time() - self.t0, 2)
            print(f"[stage] {name}: {timings[name]} s", flush=True)

    return _T()


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    assert jax.default_backend() not in ("cpu",), "need the TPU"

    import numpy as np

    from cornelis_tpu.ops.pallas_integrator import (
        host_scene_from_description,
        register_host_scene,
        render_chunk_pallas,
        warm_pallas,
    )
    from cornelis_tpu.rng import make_key
    from cornelis_tpu.scene.compile import compile_scene
    from cornelis_tpu.scene.library import cornell_box
    from cornelis_tpu.utils.barrier import device_barrier

    with stage("warm_pallas"):
        warm_pallas(blocking=True)

    # --- equal-wall-clock (valid methodology) ---------------------------
    from tools import equal_time_error

    with stage("equal_time"):
        buf = io.StringIO()

        class _Tee(io.TextIOBase):
            def write(self, s):
                buf.write(s)
                sys.__stdout__.write(s)
                sys.__stdout__.flush()
                return len(s)

        with contextlib.redirect_stdout(_Tee()):
            equal_time_error.main()
        with open("/tmp/r4_p1_equal_time.jsonl", "w") as f:
            f.write(buf.getvalue())

    # --- firefly hunt ---------------------------------------------------
    # Cornell 512^2, nee+sobol, CLAMP DISABLED: find the firefly pixels.
    # Draws are (pixel, sample)-keyed and sobol is bitwise-shared between
    # the megakernel and the XLA path, so a (pixel, chunk) found here can
    # be re-evaluated pixel-exactly on CPU by the pinned regression test.
    with stage("firefly_hunt"):
        W = H = 512
        SPP = 2048
        CHUNK = 256
        scene = compile_scene(cornell_box())
        register_host_scene(scene, host_scene_from_description(cornell_box()))
        key = make_key()  # default seed 19791102
        per_chunk_max = []
        hot = []
        for off in range(0, SPP, CHUNK):
            img = np.asarray(
                device_barrier(
                    render_chunk_pallas(
                        scene,
                        key,
                        np.uint32(off),
                        width=W,
                        height=H,
                        spp_chunk=CHUNK,
                        spp_total=SPP,
                        max_depth=64,
                        sampler="sobol",
                        mode="nee",
                        nee_clamp=float("inf"),
                    )
                )
            )
            mx = float(img.max())
            per_chunk_max.append(mx)
            if mx > 1e3:  # a chunk SUM >1e3 over 256 samples = firefly
                flat = img.max(axis=-1).ravel()
                for idx in np.argsort(flat)[-5:][::-1]:
                    if flat[idx] > 1e3:
                        hot.append(
                            {
                                "pixel": int(idx),
                                "x": int(idx % W),
                                "y": int(idx // W),
                                "chunk_offset": off,
                                "chunk_sum_max": float(flat[idx]),
                            }
                        )
            print(f"  chunk {off}: max {mx:.1f}", flush=True)
        with open("/tmp/r4_p1_firefly.json", "w") as f:
            json.dump(
                {
                    "width": W,
                    "spp_total": SPP,
                    "chunk": CHUNK,
                    "sampler": "sobol",
                    "seed": "default",
                    "per_chunk_max": per_chunk_max,
                    "hot": hot,
                },
                f,
                indent=1,
            )
        print("hot pixels:", hot, flush=True)

    with open("/tmp/r4_p1_timings.json", "w") as f:
        json.dump(timings, f, indent=1)
    print("P1 DONE", flush=True)


if __name__ == "__main__":
    main()
