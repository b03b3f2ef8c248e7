"""Scaling-efficiency sweep: rays/s vs device count over a (tiles,) mesh.

Run on real multi-chip hardware to measure the BASELINE.md target
(>=80% rays/s efficiency from 1 chip to an N-chip slice):

    python benchmarks/scaling.py                  # sweep 1..device_count
    python benchmarks/scaling.py --backend xla    # force the XLA mesh path

The measured path defaults to what a TPU session actually runs:
Pallas-under-mesh (parallel.render_chunk_mesh_pallas) on accelerators, the
XLA mesh path on CPU (where the sweep measures sharding overhead on
interpret-mode kernels otherwise). Round 2 swept only the XLA path, which
is NOT the backend a TPU session uses -- fixed per VERDICT r2 #4.

On a single-chip or CPU host this still runs (virtual devices via
XLA_FLAGS=--xla_force_host_platform_device_count=N) but measures *sharding
overhead*, not hardware scaling -- the virtual devices share the host's
physical cores. bench.py reports that overhead ratio; this script is the
sweep to run where every mesh device is its own chip.

The render is embarrassingly parallel over pixels (the reference's tile
decomposition, src/Render.cpp:335-354, as a mesh axis) -- the only
cross-device step is the output gather, so efficiency on real chips is
expected near 1.0 until per-chip batches get too small (keep >=1M live
rays per chip; SURVEY section 7 "hard parts").
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def measure(
    n_devices: int,
    *,
    width=512,
    height=512,
    spp=16,
    max_depth=32,
    backend="auto",
):
    from cornelis_tpu.parallel import (
        make_mesh,
        render_chunk_mesh,
        render_chunk_mesh_pallas,
    )
    from cornelis_tpu.rng import make_key
    from cornelis_tpu.scene.compile import compile_scene
    from cornelis_tpu.scene.library import cornell_box
    from cornelis_tpu.utils.barrier import device_barrier

    if backend == "auto":
        backend = "xla" if jax.default_backend() == "cpu" else "pallas"

    scene = compile_scene(cornell_box())
    if backend == "pallas":
        from cornelis_tpu.ops.pallas_integrator import (
            host_scene_from_description,
            register_host_scene,
        )

        register_host_scene(scene, host_scene_from_description(cornell_box()))
    key = make_key()
    mesh = make_mesh((n_devices, 1), devices=jax.devices()[:n_devices])
    kw = dict(
        mesh=mesh,
        width=width,
        height=height,
        spp_chunk=spp,
        spp_total=spp * 4,
        max_depth=max_depth,
    )
    chunk = render_chunk_mesh_pallas if backend == "pallas" else render_chunk_mesh
    if backend == "pallas" and jax.default_backend() == "cpu":
        kw_extra = {"interpret": True}  # forced pallas on cpu: interpret mode
    else:
        kw_extra = {}

    device_barrier(chunk(scene, key, jnp.uint32(0), **kw, **kw_extra))
    t0 = time.perf_counter()
    for i in (1, 2, 3):
        device_barrier(chunk(scene, key, jnp.uint32(i * spp), **kw, **kw_extra))
    dt = time.perf_counter() - t0
    return width * height * spp * 3 / dt


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--backend",
        choices=("auto", "xla", "pallas"),
        default="auto",
        help="Mesh render path to sweep; auto = what a session would run "
        "(pallas on accelerators, xla on cpu).",
    )
    args = ap.parse_args()

    counts = []
    n = 1
    total = jax.device_count()
    while n <= total:
        counts.append(n)
        n *= 2
    if counts[-1] != total:
        counts.append(total)

    base = None
    for n in counts:
        rate = measure(n, backend=args.backend)
        if base is None:
            base = rate
        eff = rate / (base * n)
        print(
            json.dumps(
                {
                    "devices": n,
                    "backend": args.backend,
                    "mrays_per_s": round(rate / 1e6, 3),
                    "efficiency_vs_1": round(eff, 3),
                }
            )
        )


if __name__ == "__main__":
    main()
