"""Round-4 TPU batch, process 3.

  1. Clamp-in-anger check: re-render the firefly chunks of
     tools/r4_p1_firefly.json with the DEFAULT scale+depth-aware clamp and
     record what the hot pixels became (is the suppressed residual small
     enough, or does the depth growth need a cap?).
  2. sphere_grid compile+runtime scaling at n = 256 and 512 objects
     (PERF.md section 2 extrapolated "~500 in 15-30 s" from two points).
  3. Measured path-length histogram (benchmarks/path_length.py logic) on
     the TPU XLA path for Cornell + sphere_grid(64).

Writes /tmp/r4_p3.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

out = {}


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    assert jax.default_backend() not in ("cpu",)

    import numpy as np

    from cornelis_tpu.ops.pallas_integrator import (
        host_scene_from_description,
        register_host_scene,
        render_chunk_pallas,
        warm_pallas,
        mark_process_warm,
    )
    from cornelis_tpu.rng import make_key
    from cornelis_tpu.scene.compile import compile_scene
    from cornelis_tpu.scene.library import cornell_box, sphere_grid
    from cornelis_tpu.utils.barrier import device_barrier

    t0 = time.time()
    warm_pallas(blocking=True)
    out["warm_s"] = round(time.time() - t0, 2)
    print("warm:", out["warm_s"], flush=True)

    # --- 1. clamped firefly values --------------------------------------
    with open("/tmp/r4_p1_firefly.json") as f:
        hunt = json.load(f)
    monsters = [h for h in hunt["hot"] if h["chunk_sum_max"] > 1e5]
    W = H = 512
    SPP, CHUNK = hunt["spp_total"], hunt["chunk"]
    scene = compile_scene(cornell_box())
    register_host_scene(scene, host_scene_from_description(cornell_box()))
    key = make_key()
    clamped = []
    for off in sorted({m["chunk_offset"] for m in monsters}):
        img = np.asarray(
            device_barrier(
                render_chunk_pallas(
                    scene, key, np.uint32(off),
                    width=W, height=H, spp_chunk=CHUNK, spp_total=SPP,
                    max_depth=64, sampler="sobol", mode="nee",
                )
            )
        )
        for m in monsters:
            if m["chunk_offset"] == off:
                v = float(img.max(axis=-1).ravel()[m["pixel"]])
                clamped.append(
                    {**m, "clamped_chunk_sum": round(v, 1),
                     "per_pixel_at_2048spp": round(v / SPP, 3)}
                )
                print(f"  pixel {m['pixel']}: {m['chunk_sum_max']:.3g} -> {v:.1f}",
                      flush=True)
    out["clamped_fireflies"] = clamped

    # --- 2. sphere_grid scaling -----------------------------------------
    rows = []
    for n in (256, 512):
        descr = sphere_grid(n)
        sc = compile_scene(descr)
        register_host_scene(sc, host_scene_from_description(descr))
        t0 = time.time()
        first = device_barrier(
            render_chunk_pallas(
                sc, key, np.uint32(0),
                width=512, height=512, spp_chunk=8, spp_total=32,
                max_depth=32,
            )
        )
        t_first = time.time() - t0
        t0 = time.time()
        acc = None
        for i in (1, 2):
            o = render_chunk_pallas(
                sc, key, np.uint32(i * 8),
                width=512, height=512, spp_chunk=8, spp_total=32,
                max_depth=32,
            )
            acc = o if acc is None else acc + o
        device_barrier(acc)
        dt = time.time() - t0
        mrays = 512 * 512 * 8 * 2 / dt / 1e6
        rows.append(
            {"objects": n + 2, "first_chunk_s": round(t_first, 1),
             "steady_mrays_per_s": round(mrays, 1)}
        )
        print(f"  sphere_grid({n}): first {t_first:.1f} s, {mrays:.1f} Mrays/s",
              flush=True)
        with open("/tmp/r4_p3.json", "w") as f:
            json.dump(out | {"sphere_grid_scaling": rows}, f, indent=1)
    out["sphere_grid_scaling"] = rows

    # --- 3. measured path length on TPU ---------------------------------
    hist = {}
    for name in ("cornell", "sphere-grid"):
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "benchmarks", "path_length.py"),
             name, "8"],
            capture_output=True, text=True, timeout=900,
        )
        line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else "{}"
        try:
            hist[name] = json.loads(line)
        except Exception:
            hist[name] = {"error": r.stdout[-500:] + r.stderr[-500:]}
        print(f"  path_length {name}: {line[:160]}", flush=True)
    out["path_length"] = hist

    mark_process_warm()
    with open("/tmp/r4_p3.json", "w") as f:
        json.dump(out, f, indent=1)
    print("P3 DONE", flush=True)


if __name__ == "__main__":
    main()
