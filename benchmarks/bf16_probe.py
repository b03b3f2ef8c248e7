"""bf16-shading feasibility probe (VERDICT r4 #8, PERF.md section 4).

The last quantified single-chip headroom items are the 23% dead-lane
divergence waste and dtype packing: bf16's min tile is (16, 128) vs
f32's (8, 128) -- twice the elements per sublane -- so IF the VPU issues
bf16 lanes at the same rate, elementwise throughput doubles. This probe
measures that on a scan-shaped workload (the sphere-quadratic FMA/sqrt
chain the megakernel's object loop is made of), f32 vs bf16, same
element count, chained with one barrier, min-of-3.

What it decides: whether a bf16 SHADING path (BRDF evaluation and
radiance accumulation in bf16, hit-t kept f32 -- t needs f32: at
Cornell's ~500-unit scale bf16's 2^-8 relative step is ~2 units against
a 1e-4 self-intersection guard) is worth the surgery. See PERF.md
section 4 for the measured row and the ship/no-ship call.

Run on the TPU host: python benchmarks/bf16_probe.py
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ROWS = 256           # per-block rows (f32); bf16 packs 2x per sublane
LANES = 128
OBJECTS = 64         # unrolled "spheres" per pass
PASSES = 8           # grid steps per dispatch
REPEAT = 64          # chained dispatches per timing


def build(dtype):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    consts = [(0.1 + 0.01 * j, 0.5 - 0.003 * j, 1.0 + 0.02 * j)
              for j in range(OBJECTS)]

    def kernel(x_ref, o_ref):
        x = x_ref[:]
        acc = jnp.zeros_like(x)
        for c, d, k in consts:
            cj = jnp.asarray(c, x.dtype)
            dj = jnp.asarray(d, x.dtype)
            kj = jnp.asarray(k, x.dtype)
            b = x * cj + dj
            cc = x * x - (cj + cj) * x + kj
            disc = b * b - cc
            # Compare + sqrt in f32 regardless of dtype: Mosaic rejects
            # bf16 vector comparisons outright on this target ("Target
            # does not support this comparison"), so a bf16 shading path
            # could at most keep the FMA chains in bf16 -- which is
            # exactly what this probe then measures.
            d32 = disc.astype(jnp.float32)
            acc = acc + jnp.where(
                d32 > 0,
                jnp.sqrt(jnp.maximum(d32, jnp.float32(1e-12))),
                jnp.zeros_like(d32),
            ).astype(x.dtype)
        o_ref[:] = acc

    shape = (ROWS * PASSES, LANES)

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            grid=(PASSES,),
            in_specs=[pl.BlockSpec((ROWS, LANES), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((ROWS, LANES), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct(shape, dtype),
        )(x)

    return run, shape


def main() -> None:
    import jax
    import jax.numpy as jnp

    from cornelis_tpu.ops.pallas_integrator import warm_pallas
    from cornelis_tpu.utils.barrier import device_barrier

    warm_pallas()
    results = {}
    for dtype in (jnp.float32, jnp.bfloat16):
        run, shape = build(dtype)
        x = jnp.linspace(0.0, 4.0, shape[0] * shape[1]).reshape(shape).astype(dtype)
        device_barrier(run(x).astype(jnp.float32))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            acc = None
            for _ in range(REPEAT):
                y = run(x)
                acc = y if acc is None else acc + y
            device_barrier(acc.astype(jnp.float32))
            best = min(best, time.perf_counter() - t0)
        elems = shape[0] * shape[1] * OBJECTS * REPEAT
        gitem = elems / best / 1e9
        results[jnp.dtype(dtype).name] = gitem
        print(f"{jnp.dtype(dtype).name:9s}: {best*1e3:7.2f} ms chained, "
              f"{gitem:7.2f} G obj-tests/s", flush=True)
    ratio = results["bfloat16"] / results["float32"]
    print(f"bf16 / f32 elementwise-scan throughput: {ratio:.2f}x", flush=True)


if __name__ == "__main__":
    main()
