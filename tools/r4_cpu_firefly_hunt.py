"""Hunt a sobol NEE firefly ON THE CPU/XLA PATH for the pinned CI test.

The TPU megakernel's fireflies (tools/r4_p1_*) do not reproduce on the
XLA-CPU lowering -- the double-grazing knife-edge paths flip on
transcendental ulps between backends -- so the regression test that pins
"the clamp suppresses the firefly" needs a firefly that CPU CI itself
deterministically produces. This scans Cornell at 128^2, sobol, NEE,
clamp disabled, and reports pixels whose chunk-sum exceeds the light
disc's own level (15 x chunk spp).

  python tools/r4_cpu_firefly_hunt.py [spp_total] [chunk]
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

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import numpy as np

    from cornelis_tpu.integrator import render_chunk
    from cornelis_tpu.rng import make_key
    from cornelis_tpu.scene.compile import compile_scene
    from cornelis_tpu.scene.library import cornell_box

    W = H = 128
    SPP = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    CHUNK = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    scene = compile_scene(cornell_box())
    key = make_key()
    light_level = 15.0 * CHUNK  # the emitter's own pixels sum to this
    hot = []
    for off in range(0, SPP, CHUNK):
        t0 = time.time()
        img = np.asarray(
            render_chunk(
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
        flat = img.max(axis=-1).ravel()
        for idx in np.argsort(flat)[-8:][::-1]:
            if flat[idx] > 2.0 * light_level:
                hot.append(
                    {
                        "pixel": int(idx),
                        "x": int(idx % W),
                        "y": int(idx // W),
                        "chunk_offset": off,
                        "chunk_sum_max": float(flat[idx]),
                    }
                )
        print(
            f"chunk {off}: max {flat.max():.1f} ({time.time()-t0:.1f} s)",
            flush=True,
        )
    with open("/tmp/r4_cpu_firefly.json", "w") as f:
        json.dump(
            {"width": W, "spp_total": SPP, "chunk": CHUNK, "hot": hot}, f, indent=1
        )
    print("hot:", json.dumps(hot), flush=True)


if __name__ == "__main__":
    main()
