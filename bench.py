"""Benchmark: primary-ray throughput on the Cornell scene.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline anchor (BASELINE.md): the reference's best recorded Cornell run,
512x512 @ 16k spp in 2 minutes on an unknown developer CPU ~= 36 M primary
paths/s (secondary bounce rays excluded on both sides, so the comparison is
like-for-like). vs_baseline = ours / 36e6.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

BASELINE_PRIMARY_RAYS_PER_S = 36e6

WIDTH = HEIGHT = 512
SPP_CHUNK = 32
MAX_DEPTH = 64
TIMED_CHUNKS = 4


def main() -> None:
    from cornelis_tpu.integrator import render_chunk
    from cornelis_tpu.rng import make_key
    from cornelis_tpu.scene.compile import compile_scene
    from cornelis_tpu.scene.library import cornell_box

    scene = compile_scene(cornell_box())
    key = make_key()
    spp_total = SPP_CHUNK * (TIMED_CHUNKS + 1)

    def chunk(offset):
        return render_chunk(
            scene,
            key,
            jnp.uint32(offset),
            width=WIDTH,
            height=HEIGHT,
            spp_chunk=SPP_CHUNK,
            spp_total=spp_total,
            max_depth=MAX_DEPTH,
        )

    # Warmup / compile.
    jax.block_until_ready(chunk(0))

    start = time.perf_counter()
    acc = None
    for i in range(TIMED_CHUNKS):
        out = chunk((i + 1) * SPP_CHUNK)
        acc = out if acc is None else acc + out
    jax.block_until_ready(acc)
    elapsed = time.perf_counter() - start

    primary_rays = WIDTH * HEIGHT * SPP_CHUNK * TIMED_CHUNKS
    rays_per_s = primary_rays / elapsed
    print(
        json.dumps(
            {
                "metric": "cornell_primary_rays",
                "value": round(rays_per_s / 1e6, 3),
                "unit": "Mrays/s",
                "vs_baseline": round(rays_per_s / BASELINE_PRIMARY_RAYS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
