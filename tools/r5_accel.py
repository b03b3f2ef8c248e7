"""Round-5 many-object throughput probe (VERDICT r4 #3).

Steady-state megakernel Mrays/s on Cornell (9 objects), sphere_grid(64)
(66), and sphere_grid(512) (514) -- the 3-point sweep PERF.md section 2
tracks. Methodology: chained chunks, one scalar-fetch barrier, min-of-3
(the tunnel moves +-15% between single runs).

Round-4 baseline (tile-major ray order shipped): Cornell ~195,
grid(64) ~100, grid(512) 21.7 Mrays/s -- the unrolled brute-force
candidate scan is O(objects) per segment.

Run on the TPU host: python tools/r5_accel.py [scenes...]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

W = H = 512
SPP = 32
MAX_DEPTH = 64
CHUNKS = 4


def main() -> None:
    import jax
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from cornelis_tpu.ops.pallas_integrator import (
        host_scene_from_description,
        register_host_scene,
        render_chunk_pallas,
        warm_pallas,
    )
    from cornelis_tpu.rng import make_key
    from cornelis_tpu.scene.compile import compile_scene
    from cornelis_tpu.scene.library import cornell_box, sphere_grid
    from cornelis_tpu.utils.barrier import device_barrier

    which = sys.argv[1:] or ["cornell", "grid64", "grid512"]
    makers = {
        "cornell": cornell_box,
        "grid64": lambda: sphere_grid(64),
        "grid256": lambda: sphere_grid(256),
        "grid512": lambda: sphere_grid(512),
    }

    warm_pallas()
    key = make_key()
    for name in which:
        desc = makers[name]()
        scene = compile_scene(desc)
        register_host_scene(scene, host_scene_from_description(desc))
        spp_total = SPP * (CHUNKS + 1)

        def chunk(off):
            return render_chunk_pallas(
                scene, key, np.uint32(off), width=W, height=H,
                spp_chunk=SPP, spp_total=spp_total, max_depth=MAX_DEPTH,
            )

        t0 = time.time()
        device_barrier(chunk(0))
        first = time.time() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            acc = None
            for i in range(CHUNKS):
                out = chunk((i + 1) * SPP)
                acc = out if acc is None else acc + out
            device_barrier(acc)
            best = min(best, time.perf_counter() - t0)
        mrays = W * H * SPP * CHUNKS / best / 1e6
        print(f"{name:8s}: first chunk {first:6.1f} s, steady "
              f"{mrays:7.1f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
