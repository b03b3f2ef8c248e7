"""Animation workload: the dynamic-scene kernel's reason to exist.

Renders N frames of the Cornell box with the gold sphere orbiting, twice:

  baked   : render_chunk_pallas -- every frame is a NEW scene, so every
            frame recompiles the kernel (the scene is baked as literals);
  dynamic : render_chunk_pallas_dynamic -- one compile, then per-frame
            cost is just the render.

Writes docs/perf_r5/r5_animation.json with per-frame wall times and a
film-strip PNG of the dynamic frames (visual proof the scene actually
changes between renders).

Run on the TPU host: python tools/r5_animation.py [frames]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

W = H = 256
SPP = 64
MAX_DEPTH = 16


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from cornelis_tpu.math.color import srgb_encode
    from cornelis_tpu.math.vec import Vec3
    from cornelis_tpu.ops.pallas_dynamic import render_chunk_pallas_dynamic
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
    from cornelis_tpu.utils.png import write_png

    frames_n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    warm_pallas()
    key = make_key(42)
    base_desc = cornell_box()
    base = compile_scene(base_desc)
    # Gold sphere = the last sphere row; orbit it around its rest position.
    gi = base.num_spheres - 1
    rest = (
        float(base.sphere_center.x[gi]),
        float(base.sphere_center.z[gi]),
    )

    def frame_scene(i):
        ang = 2.0 * math.pi * i / frames_n
        cx = base.sphere_center.x.at[gi].set(rest[0] + 120.0 * math.cos(ang))
        cz = base.sphere_center.z.at[gi].set(rest[1] + 120.0 * math.sin(ang))
        return base._replace(
            sphere_center=Vec3(cx, base.sphere_center.y, cz)
        )

    def frame_desc(i):
        # The baked kernel needs host tables per frame (its normal path).
        ang = 2.0 * math.pi * i / frames_n
        d = cornell_box()
        s = d.spheres[-1]
        s.center = (
            rest[0] + 120.0 * math.cos(ang),
            s.center[1],
            rest[1] + 120.0 * math.sin(ang),
        )
        return d

    out = {"frames": frames_n, "shape": f"{W}x{H}x{SPP}spp_d{MAX_DEPTH}"}
    results = {}
    strip = []
    for backend in ("dynamic", "baked"):
        times = []
        for i in range(frames_n):
            t0 = time.perf_counter()
            if backend == "dynamic":
                img = render_chunk_pallas_dynamic(
                    frame_scene(i), key, np.uint32(0), width=W, height=H,
                    spp_chunk=SPP, spp_total=SPP, max_depth=MAX_DEPTH,
                )
            else:
                desc = frame_desc(i)
                scene = compile_scene(desc)
                register_host_scene(scene, host_scene_from_description(desc))
                img = render_chunk_pallas(
                    scene, key, np.uint32(0), width=W, height=H,
                    spp_chunk=SPP, spp_total=SPP, max_depth=MAX_DEPTH,
                )
            img = device_barrier(img)
            times.append(round(time.perf_counter() - t0, 3))
            if backend == "dynamic":
                strip.append(np.asarray(img) / SPP)
        results[backend] = {
            "per_frame_s": times,
            "first_s": times[0],
            "steady_mean_s": round(float(np.mean(times[1:])), 3),
        }
        print(f"{backend:8s}: frames {times}", flush=True)

    out.update(results)
    out["steady_speedup"] = round(
        results["baked"]["steady_mean_s"] / results["dynamic"]["steady_mean_s"], 1
    )
    os.makedirs(os.path.join(REPO, "docs", "perf_r5"), exist_ok=True)
    with open(os.path.join(REPO, "docs", "perf_r5", "r5_animation.json"), "w") as f:
        json.dump(out, f, indent=1)

    # Film strip of every other dynamic frame (visual proof of motion).
    import jax.numpy as jnp2

    sel = strip[:: max(1, frames_n // 4)][:4]
    row = np.concatenate(sel, axis=1)
    rgb8 = np.asarray(
        jnp.clip(srgb_encode(jnp2.asarray(row)) * 255.0 + 0.5, 0, 255)
    ).astype(np.uint8)
    write_png(os.path.join(REPO, "docs", "r5_animation_strip.png"), rgb8)
    print(json.dumps(out)[:600], flush=True)
    print("ANIMATION DONE", flush=True)


if __name__ == "__main__":
    main()
