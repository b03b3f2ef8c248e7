"""Backend comparison probe: XLA wavefront vs Pallas megakernel.

Per-chunk blocking timings (no async pipelining -- bench.py measures the
pipelined session throughput; this isolates single-dispatch latency).
Throughput is labelled camera Mrays/s: W*H*SPP primary (camera) rays per
second; each ray bounces up to max_depth times, so traced-segment
throughput is a few times higher.
"""

import time

import jax
import jax.numpy as jnp


def timeit(name, f, *, rays, spp, n=4):
    # Shared scalar-fetch barrier (reproducer + rationale in
    # cornelis_tpu/utils/barrier.py).
    from cornelis_tpu.utils.barrier import device_barrier

    out = device_barrier(f(0))  # warmup / compile (kernel + reducer)
    times = []
    for i in range(n):
        t = time.perf_counter()
        out = device_barrier(f((i + 1) * spp))
        times.append(time.perf_counter() - t)
    dt = min(times)
    print(
        f"{name}: {rays / dt / 1e6:.1f} camera Mrays/s  "
        f"times_ms={[round(t * 1e3, 1) for t in times]}  "
        f"mean_px={float(out.mean()):.4f}"
    )


def main():
    from cornelis_tpu.integrator import render_chunk
    from cornelis_tpu.ops.pallas_integrator import render_chunk_pallas
    from cornelis_tpu.rng import make_key
    from cornelis_tpu.scene.compile import compile_scene
    from cornelis_tpu.scene.library import cornell_box

    scene = compile_scene(cornell_box())
    key = make_key()
    W = H = 512
    SPP, TOT, MD = 32, 160, 64
    kw = dict(width=W, height=H, spp_chunk=SPP, spp_total=TOT, max_depth=MD)

    def xla(off):
        return render_chunk(scene, key, jnp.uint32(off), **kw)

    def pallas(off):
        return render_chunk_pallas(scene, key, jnp.uint32(off), **kw)

    timeit("XLA wavefront", xla, rays=W * H * SPP, spp=SPP)
    if jax.default_backend() != "cpu":
        timeit("Pallas megakernel", pallas, rays=W * H * SPP, spp=SPP)


if __name__ == "__main__":
    main()
