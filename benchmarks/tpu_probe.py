"""TPU stage-timing + steady-state throughput probe for the Pallas path.

Times each stage of a cold session (imports, scene compile, host-table
build, kernel compile, first dispatch) and then steady-state chunk
throughput -- the tool for attributing cold-start stalls (tunnel transfers
vs Mosaic compile) and validating bench.py's headline number.

Run on the TPU: python benchmarks/tpu_probe.py [width height spp reps]
"""

import sys
import time

t0 = time.perf_counter()
import jax
import jax.numpy as jnp
import numpy as np

from cornelis_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from cornelis_tpu.ops.pallas_integrator import (
    host_scene_from_description,
    register_host_scene,
    render_chunk_pallas,
)
from cornelis_tpu.rng import make_key
from cornelis_tpu.scene.compile import compile_scene
from cornelis_tpu.scene.library import cornell_box

print(f"imports            {time.perf_counter() - t0:6.2f} s", flush=True)


def main() -> None:
    args = [int(a) for a in sys.argv[1:]]
    W = args[0] if len(args) > 0 else 512
    H = args[1] if len(args) > 1 else 512
    SPP = args[2] if len(args) > 2 else 32
    REPS = args[3] if len(args) > 3 else 4
    MAX_DEPTH = 64

    t0 = time.perf_counter()
    descr = cornell_box()
    scene = compile_scene(descr)
    jax.block_until_ready(scene.sphere_radius)
    print(f"compile_scene      {time.perf_counter() - t0:6.2f} s", flush=True)

    t0 = time.perf_counter()
    register_host_scene(scene, host_scene_from_description(descr))
    print(f"host tables (cpu)  {time.perf_counter() - t0:6.2f} s", flush=True)

    key = make_key()
    spp_total = SPP * (REPS + 1)

    def chunk(off):
        return render_chunk_pallas(
            scene,
            key,
            np.uint32(off),
            width=W,
            height=H,
            spp_chunk=SPP,
            spp_total=spp_total,
            max_depth=MAX_DEPTH,
        )

    # Shared scalar-fetch barrier (reproducer + rationale in
    # cornelis_tpu/utils/barrier.py).
    from cornelis_tpu.utils.barrier import device_barrier as drain

    t0 = time.perf_counter()
    drain(chunk(0))
    print(f"warmup (compile)   {time.perf_counter() - t0:6.2f} s", flush=True)

    rays = W * H * SPP
    for rep in range(REPS):
        t0 = time.perf_counter()
        drain(chunk((rep + 1) * SPP))
        dt = time.perf_counter() - t0
        print(
            f"rep {rep}: {rays / dt / 1e6:7.1f} Mrays/s  ({dt * 1e3:6.1f} ms)",
            flush=True,
        )

    # Pipelined (async-dispatch) rate over all reps -- what a session sees.
    t0 = time.perf_counter()
    acc = None
    for rep in range(REPS):
        out = chunk((rep + 1) * SPP)
        acc = out if acc is None else acc + out
    drain(acc)
    dt = time.perf_counter() - t0
    print(f"pipelined: {rays * REPS / dt / 1e6:7.1f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
