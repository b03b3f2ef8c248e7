"""Benchmark: Cornell primary-ray throughput on the session's best backend.

Prints ONE JSON line with the headline metric plus the BASELINE.md target
fields:

  metric/value/unit/vs_baseline : 512x512 Cornell Mrays/s (primary) on the
                                  best backend for this platform, against
                                  the reference's 36 M primary paths/s
                                  anchor (BASELINE.md);
  mrays_1080p / spp_per_s_1080p : the BASELINE.md stated metric -- 1080p
                                  Cornell primary Mrays/s and samples-per-
                                  pixel per second;
  backend                       : which backend was timed (pallas on TPU,
                                  xla elsewhere);
  *_spread                      : relative dispersion (max-min)/min of the
                                  min-of-3 chained repeats behind each
                                  throughput field -- the tunnel moves
                                  +-15%, so every number carries its own
                                  error bar (VERDICT r4 #4);
  mesh_overhead_ratio_8dev_raw  : sharding-overhead PROXY -- rays/s on an
                                  8-device virtual CPU mesh vs 1 device on
                                  the same host silicon. NOT pod-scaling
                                  efficiency (that needs real chips:
                                  benchmarks/scaling.py); ~1.0 means the
                                  sharded program adds no measurable
                                  overhead (VERDICT r4 #6).

Baseline anchor: the reference's best recorded Cornell run, 512x512 @ 16k
spp in 2 minutes on an unknown developer CPU ~= 36 M primary paths/s
(secondary bounce rays excluded on both sides). vs_baseline = ours / 36e6.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

BASELINE_PRIMARY_RAYS_PER_S = 36e6
MAX_DEPTH = 64
TIMED_CHUNKS = 4
REPEATS = 3  # min-of-3 chained timing for every throughput field

_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")


def _enable_compile_cache() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def _measure(
    width: int,
    height: int,
    spp_chunk: int,
    use_pallas: bool,
    sampler: str = "uniform",
    mode: str = "path",
) -> tuple:
    """(best primary rays/s, relative spread) over REPEATS chained runs.

    Each repeat chains TIMED_CHUNKS chunk dispatches with ONE barrier at
    the end; the reported rate is the best repeat (min elapsed) and spread
    is (max - min) / min over the repeat rates. Round-4 lesson (VERDICT r4
    #4): a single timed run moved -13% round-over-round on tunnel noise
    alone (README declares +-15% tunnel variance), which made regression
    detection impossible; min-of-N chained is the methodology the diff
    bench already used and PERF.md section 1 prescribes."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cornelis_tpu.integrator import render_chunk
    from cornelis_tpu.rng import make_key
    from cornelis_tpu.scene.compile import compile_scene
    from cornelis_tpu.scene.library import cornell_box

    scene = compile_scene(cornell_box())
    key = make_key()
    spp_total = spp_chunk * (TIMED_CHUNKS + 1)

    if use_pallas:
        from cornelis_tpu.ops.pallas_integrator import (
            host_scene_from_description,
            register_host_scene,
            render_chunk_pallas,
        )

        # Host scene tables from the description via the CPU backend: the
        # bench never does a TPU->host pytree fetch (unpredictably slow
        # over a tunneled device -- measured 1.4 s to 97 s).
        register_host_scene(scene, host_scene_from_description(cornell_box()))

        def chunk(offset):
            return render_chunk_pallas(
                scene,
                key,
                np.uint32(offset),
                width=width,
                height=height,
                spp_chunk=spp_chunk,
                spp_total=spp_total,
                max_depth=MAX_DEPTH,
                sampler=sampler,
                mode=mode,
            )

    else:

        def chunk(offset):
            return render_chunk(
                scene,
                key,
                jnp.uint32(offset),
                width=width,
                height=height,
                spp_chunk=spp_chunk,
                spp_total=spp_total,
                max_depth=MAX_DEPTH,
                sampler=sampler,
                mode=mode,
            )

    # Shared scalar-fetch barrier (reproducer + rationale in
    # cornelis_tpu/utils/barrier.py). The reduce executable is compiled
    # during warmup so the timed region pays no compile.
    from cornelis_tpu.utils.barrier import device_barrier

    w = chunk(0)
    device_barrier(w + w)  # warmup / compile (kernel + accumulate + reducer)

    rates = []
    for _ in range(REPEATS):
        start = time.perf_counter()
        acc = None
        for i in range(TIMED_CHUNKS):
            out = chunk((i + 1) * spp_chunk)
            acc = out if acc is None else acc + out
        device_barrier(acc)  # hard barrier: forces execution of every chunk
        elapsed = time.perf_counter() - start
        rates.append(width * height * spp_chunk * TIMED_CHUNKS / elapsed)
    best = max(rates)
    spread = (best - min(rates)) / min(rates)
    return best, spread


def _measure_diff(width: int = 128, height: int = 128, spp: int = 32,
                  max_depth: int = 8, mode: str = "path",
                  prefix: str = "diff") -> dict:
    """Differentiable-mode cost at a realistic shape (VERDICT r3 #4).

    Times the REAL Adam train step (value_and_grad through the unrolled
    wavefront, dual-buffer MSE loss = 2 independent renders per step,
    diff/inverse.py) and the same loss WITHOUT the gradient, so the record
    carries steps/s, forward+backward primary-ray throughput, and the
    backward-over-forward cost ratio. The Pallas megakernel has no VJP --
    diff mode always runs the XLA wavefront (PERF.md 'Differentiable
    mode'), which is what is measured here. mode="nee" times the round-5
    differentiable next-event estimator (prefix its fields accordingly).
    """
    import jax
    import jax.numpy as jnp

    from cornelis_tpu.diff.inverse import InverseRenderer, make_loss
    from cornelis_tpu.scene.compile import compile_scene
    from cornelis_tpu.scene.library import cornell_box
    from cornelis_tpu.utils.barrier import device_barrier

    scene = compile_scene(cornell_box())
    target = jnp.zeros((height, width, 3), jnp.float32)
    kw = dict(width=width, height=height, spp=spp, max_depth=max_depth,
              mode=mode)

    inv = InverseRenderer(
        scene, target, fields=("mat_albedo", "mat_roughness"), **kw
    )
    inv.step()  # compile + execute once (step() blocks on the loss value)

    # CHAINED steps (state carried on device, ONE barrier at the end):
    # the true sustainable training throughput. inv.step() fetches the
    # loss scalar every step, which on this tunnel costs an erratic
    # 0.1-1.5 s round-trip -- measuring THAT times the tunnel, not the
    # backward pass (it burned round-3 #4's first numbers: the 'bwd/fwd
    # ratio' wandered 2.4-32x between runs).
    steps = 8
    dt_step = float("inf")
    state, root = inv.state, inv._root_key
    for _ in range(3):  # min-of-3: tunnel variance
        t0 = time.perf_counter()
        loss = None
        for _ in range(steps):
            state, loss = inv._train_step(state, root)
        device_barrier(loss)
        dt_step = min(dt_step, (time.perf_counter() - t0) / steps)
    # Interactive-loop rate (loss fetched each step) for comparison.
    t0 = time.perf_counter()
    for _ in range(4):
        inv.step()
    dt_step_sync = (time.perf_counter() - t0) / 4

    # The identical loss (2 renders, same unrolled program) without grad.
    # Losses are CHAINED and barriered once: a per-iteration barrier would
    # time tunnel round-trips (erratic 20 ms - 1.5 s), not compute, and
    # the bwd/fwd ratio wandered 2.4-7.7x between runs because of it.
    loss_fn = jax.jit(make_loss(target=target, base_scene=scene, **kw))
    params = inv.state.params
    key = jax.random.key(7)
    device_barrier(loss_fn(params, key))
    fwd_steps = 8
    dt_fwd = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        acc = None
        for i in range(fwd_steps):
            l = loss_fn(params, jax.random.fold_in(key, i))
            acc = l if acc is None else acc + l
        device_barrier(acc)
        dt_fwd = min(dt_fwd, (time.perf_counter() - t0) / fwd_steps)

    rays_per_step = width * height * spp * 2  # dual-buffer: 2 renders/step
    return {
        f"{prefix}_shape": f"{width}x{height}x{spp}spp_d{max_depth}",
        f"{prefix}_steps_per_s": round(1.0 / dt_step, 3),
        f"{prefix}_steps_per_s_sync": round(1.0 / dt_step_sync, 3),
        f"{prefix}_fwd_bwd_mrays": round(rays_per_step / dt_step / 1e6, 3),
        f"{prefix}_fwd_mrays": round(rays_per_step / dt_fwd / 1e6, 3),
        f"{prefix}_bwd_over_fwd": round(dt_step / dt_fwd - 1.0, 2),
    }


_SCALING_CHILD = r"""
import sys, time, json
n = int(sys.argv[1])
import jax
# A sitecustomize may have imported jax already (env vars too late);
# backends initialize lazily so config still wins.
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from cornelis_tpu.parallel import make_mesh, render_chunk_mesh
from cornelis_tpu.rng import make_key
from cornelis_tpu.scene.compile import compile_scene
from cornelis_tpu.scene.library import cornell_box

W = H = 256
SPP = 8
scene = compile_scene(cornell_box())
key = make_key()
mesh = make_mesh((n, 1))
kw = dict(mesh=mesh, width=W, height=H, spp_chunk=SPP, spp_total=SPP * 3,
          max_depth=16)
# Sweep the path a TPU session actually runs: the Pallas megakernel under
# shard_map (interpret-mode on these CPU devices -- same program structure,
# collectives, and sharding as the real kernel; VERDICT r2 #4).
from cornelis_tpu.parallel import render_chunk_mesh_pallas
from cornelis_tpu.utils.barrier import device_barrier
kw["interpret"] = True
device_barrier(render_chunk_mesh_pallas(scene, key, jnp.uint32(0), **kw))
rates = []
for r in range(3):  # min-of-3: host scheduling noise
    t0 = time.perf_counter()
    acc = None
    for i in (1, 2):
        out = render_chunk_mesh_pallas(scene, key, jnp.uint32(i * SPP), **kw)
        acc = out if acc is None else acc + out
    device_barrier(acc)
    dt = time.perf_counter() - t0
    rates.append(W * H * SPP * 2 / dt)
print(json.dumps({"rates_per_s": rates}))
"""


def _sharding_overhead_proxy() -> dict | None:
    """SHARDING-OVERHEAD PROXY (not pod-scaling efficiency): rays/s with an
    8-way virtual-CPU mesh vs rays/s unsharded, on the SAME host silicon,
    running the session's real TPU program structure (Pallas-under-
    shard_map, interpret mode).

    The 8 virtual devices share this host's physical cores, so wall-clock
    SPEEDUP is not measurable here and this field must not be read as the
    BASELINE.md >=80% pod-scaling target -- real multi-chip hardware is
    required for that (benchmarks/scaling.py is the sweep to run there).
    What IS measurable is the overhead the sharded program adds
    (collectives, dispatch, padding): a raw ratio near 1.0 means sharding
    added no measurable overhead. Ratios ABOVE 1.0 are host-noise /
    thread-scheduling artifacts (round-4 measured 1.185 raw); the record
    therefore reports the RAW ratio with its dispersion over min-of-3
    repeats per topology instead of a clamped value (VERDICT r4 #6).
    Subprocesses: device count is fixed at backend init, so each topology
    needs a fresh process. Returns None if either child fails."""
    rates = {}
    spreads = {}
    repo = os.path.dirname(os.path.abspath(__file__))
    for n in (1, 8):
        env = dict(os.environ)
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={n}"
        ).strip()
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
        try:
            out = subprocess.run(
                [sys.executable, "-c", _SCALING_CHILD, str(n)],
                capture_output=True,
                text=True,
                timeout=1200,
                cwd=repo,
                env=env,
            )
            rs = json.loads(out.stdout.strip().splitlines()[-1])["rates_per_s"]
            rates[n] = max(rs)
            spreads[n] = (max(rs) - min(rs)) / min(rs)
        except Exception:
            return None
    return {
        "mesh_overhead_ratio_8dev_raw": round(rates[8] / rates[1], 3),
        # Worst-case relative dispersion of the two min-of-3 measurements
        # that form the ratio -- the honest error bar on _raw.
        "mesh_overhead_ratio_8dev_spread": round(max(spreads.values()), 3),
    }


def main() -> None:
    _enable_compile_cache()
    import jax

    on_tpu = jax.default_backend() not in ("cpu",)

    rays_512, spread_512 = _measure(512, 512, 32, use_pallas=on_tpu)
    rays_1080p, spread_1080p = _measure(1920, 1080, 8, use_pallas=on_tpu)
    # Extension modes on the same backend (VERDICT r2 #5): what NEE's extra
    # shadow-ray intersection and sobol's per-draw scramble loop cost in
    # raw throughput -- combine with README's error-vs-wall-clock table.
    rays_nee, spread_nee = _measure(512, 512, 32, use_pallas=on_tpu, mode="nee")
    rays_sobol, spread_sobol = _measure(
        512, 512, 32, use_pallas=on_tpu, sampler="sobol"
    )

    record = {
        "metric": "cornell_primary_rays",
        "value": round(rays_512 / 1e6, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(rays_512 / BASELINE_PRIMARY_RAYS_PER_S, 3),
        "backend": "pallas" if on_tpu else "xla",
        "value_spread": round(spread_512, 3),
        "mrays_1080p": round(rays_1080p / 1e6, 3),
        "mrays_1080p_spread": round(spread_1080p, 3),
        "spp_per_s_1080p": round(rays_1080p / (1920 * 1080), 3),
        "mrays_512_nee": round(rays_nee / 1e6, 3),
        "mrays_512_nee_spread": round(spread_nee, 3),
        "mrays_512_sobol": round(rays_sobol / 1e6, 3),
        "mrays_512_sobol_spread": round(spread_sobol, 3),
    }
    if os.environ.get("BENCH_SKIP_DIFF") != "1":
        record.update(_measure_diff())
        # The round-5 differentiable NEE estimator (same shape): ~1.8x the
        # step cost of path mode for a measured 7x lower albedo gradient
        # variance at equal spp on Cornell (tools/r5_inverse.py,
        # PERF.md 2b) -- ~3.8x net training efficiency.
        record.update(_measure_diff(mode="nee", prefix="diff_nee"))
    if os.environ.get("BENCH_SKIP_SCALING") != "1":
        proxy = _sharding_overhead_proxy()
        if proxy is not None:
            record.update(proxy)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
