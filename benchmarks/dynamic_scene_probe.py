"""Dynamic-scene-table cost probe (round 5).

The megakernel bakes scene tables as compile-time literals: peak
throughput, but ANY scene change -- an animated transform, an inverse-
render parameter step -- recompiles the kernel (1-25 s by scene size,
PERF.md "Scene-size compile scaling"). The XLA wavefront has no such
cliff (tables are traced arrays) but runs ~2.5x slower than the kernel.

The design question for a scene-as-OPERAND megakernel (compile once,
render any same-shape scene): what does reading per-object parameters
from SMEM inside the object loop cost versus baked literals? This probe
isolates exactly that on the sphere-t scan shape:

  baked   : unrolled scan, (cx, cy, cz, r) as Python-float literals
  dynamic : fori_loop over an SMEM (S, 4) table, scalars read per object

Run on the TPU host: python benchmarks/dynamic_scene_probe.py [n_obj]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ROWS = 64
LANES = 128
PASSES = 16
REPEAT = 32


def _consts(n):
    return [
        (
            0.5 + 3.1 * (j % 8),
            0.5 + 3.1 * ((j // 8) % 8),
            0.5 + 3.1 * (j // 64),
            0.45 + 0.1 * (j % 3),
        )
        for j in range(n)
    ]


def _scan_body(ox, oy, oz, dx, dy, dz, cx, cy, cz, r, best):
    import jax.numpy as jnp

    # the sphere-quadratic shape (normalized d: a == 1)
    rx, ry, rz = ox - cx, oy - cy, oz - cz
    b = rx * dx + ry * dy + rz * dz
    c = rx * rx + ry * ry + rz * rz - r * r
    disc = b * b - c
    shift = jnp.sqrt(jnp.maximum(disc, 1e-12))
    t0 = -b - shift
    t = jnp.where((disc >= 0.0) & (t0 > 1e-3), t0, jnp.inf)
    return jnp.minimum(best, t)


def build_baked(n_obj):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    consts = _consts(n_obj)
    shape = (ROWS * PASSES, LANES)

    def kernel(o_ref, out_ref):
        ox = o_ref[:]
        oy = ox * 0.5
        oz = ox * 0.25
        dx = jnp.full_like(ox, 0.27)
        dy = jnp.full_like(ox, 0.53)
        dz = jnp.full_like(ox, 0.80)
        best = jnp.full_like(ox, jnp.inf)
        for cx, cy, cz, r in consts:
            best = _scan_body(ox, oy, oz, dx, dy, dz, cx, cy, cz, r, best)
        out_ref[:] = best

    @jax.jit
    def run(o):
        return pl.pallas_call(
            kernel,
            grid=(PASSES,),
            in_specs=[pl.BlockSpec((ROWS, LANES), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((ROWS, LANES), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        )(o)

    return run, shape, None


def build_dynamic(n_obj):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    shape = (ROWS * PASSES, LANES)
    table = np.asarray(_consts(n_obj), np.float32)  # (S, 4)

    def kernel(tab_ref, o_ref, out_ref):
        ox = o_ref[:]
        oy = ox * 0.5
        oz = ox * 0.25
        dx = jnp.full_like(ox, 0.27)
        dy = jnp.full_like(ox, 0.53)
        dz = jnp.full_like(ox, 0.80)

        def body(j, best):
            cx = tab_ref[j, 0]
            cy = tab_ref[j, 1]
            cz = tab_ref[j, 2]
            r = tab_ref[j, 3]
            return _scan_body(ox, oy, oz, dx, dy, dz, cx, cy, cz, r, best)

        out_ref[:] = jax.lax.fori_loop(
            0, n_obj, body, jnp.full_like(ox, jnp.inf)
        )

    @jax.jit
    def run(tab, o):
        return pl.pallas_call(
            kernel,
            grid=(PASSES,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((ROWS, LANES), lambda i: (i, 0)),
            ],
            out_specs=pl.BlockSpec((ROWS, LANES), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        )(tab, o)

    return run, shape, jnp.asarray(table)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from cornelis_tpu.ops.pallas_integrator import warm_pallas
    from cornelis_tpu.utils.barrier import device_barrier

    n_obj = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    warm_pallas()
    results = {}
    for name, build in (("baked", build_baked), ("dynamic", build_dynamic)):
        t0 = time.time()
        run, shape, tab = build(n_obj)
        x = jnp.linspace(0.0, 24.0, shape[0] * shape[1], dtype=jnp.float32).reshape(shape)
        args = (x,) if tab is None else (tab, x)
        device_barrier(run(*args))
        compile_s = time.time() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            acc = None
            for _ in range(REPEAT):
                y = run(*args)
                acc = y if acc is None else acc + y
            device_barrier(acc)
            best = min(best, time.perf_counter() - t0)
        tests = shape[0] * shape[1] * n_obj * REPEAT
        results[name] = tests / best / 1e9
        print(f"{name:8s} ({n_obj} obj): first {compile_s:5.1f} s, "
              f"{best*1e3:7.2f} ms chained, {results[name]:7.2f} G obj-tests/s",
              flush=True)
    print(f"dynamic / baked scan throughput: "
          f"{results['dynamic']/results['baked']:.2f}x", flush=True)


if __name__ == "__main__":
    main()
