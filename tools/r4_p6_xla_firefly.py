"""Hunt fireflies on the TPU *XLA* path (render_chunk, not the
megakernel): candidates found here have a chance of reproducing under the
XLA-CPU lowering (same HLO, different target) -- each one gets
cross-checked on CPU by the caller. Clamp disabled, sobol, NEE.

Writes /tmp/r4_xla_firefly.json.
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
    assert jax.default_backend() not in ("cpu",)

    import numpy as np

    from cornelis_tpu.integrator import render_chunk
    from cornelis_tpu.rng import make_key
    from cornelis_tpu.scene.compile import compile_scene
    from cornelis_tpu.scene.library import cornell_box
    from cornelis_tpu.utils.barrier import device_barrier

    W = H = 512
    SPP, CHUNK = 2048, 256
    scene = compile_scene(cornell_box())
    key = make_key()
    hot = []
    for off in range(0, SPP, CHUNK):
        t0 = time.time()
        img = np.asarray(
            device_barrier(
                render_chunk(
                    scene, key, np.uint32(off),
                    width=W, height=H, spp_chunk=CHUNK, spp_total=SPP,
                    max_depth=64, sampler="sobol", mode="nee",
                    nee_clamp=float("inf"),
                )
            )
        )
        flat = img.max(axis=-1).ravel()
        for idx in np.argsort(flat)[-8:][::-1]:
            # > 1e4 excludes the light disc (15 x 256 = 3840).
            if flat[idx] > 1e4:
                hot.append(
                    {"pixel": int(idx), "x": int(idx % W), "y": int(idx // W),
                     "chunk_offset": off, "chunk_sum_max": float(flat[idx])}
                )
        print(f"chunk {off}: max {flat.max():.3g} ({time.time()-t0:.1f} s)",
              flush=True)
    with open("/tmp/r4_xla_firefly.json", "w") as f:
        json.dump({"width": W, "spp_total": SPP, "chunk": CHUNK, "hot": hot},
                  f, indent=1)
    print("hot:", json.dumps(hot), flush=True)


if __name__ == "__main__":
    main()
