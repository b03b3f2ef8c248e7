"""Round-5 diff-backward cost breakdown (VERDICT r4 #1).

Round 4 measured the backward sweep at ~23x the forward on the v5e
(128^2 x 32 spp, max_depth 8 value_and_grad) and left two levers named
but unmeasured. This tool times the REAL train-step shape under A/B
variants to find where the 23x lives:

  fwd          : dual-buffer loss, no grad (the baseline denominator)
  step         : value_and_grad train step, current code
  step_nograd_emission etc. -- variants toggled via module flags below

Methodology per the tunnel rules (PERF.md section 1): chained iterations,
one scalar-fetch barrier, min-of-3.

Run on the TPU host: python tools/r5_diff_prof.py [variant...]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

W = H = 128
SPP = 32
DEPTH = 8
STEPS = 8


def timed(fn, *args):
    from cornelis_tpu.utils.barrier import device_barrier

    out = fn(*args)
    device_barrier(out if not isinstance(out, tuple) else out[-1])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        acc = None
        for i in range(STEPS):
            out = fn(*args)
            s = out if not isinstance(out, tuple) else out[-1]
            acc = s if acc is None else acc + s
        device_barrier(acc)
        best = min(best, (time.perf_counter() - t0) / STEPS)
    return best


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import jax.numpy as jnp

    from cornelis_tpu.diff.inverse import extract_params, make_loss
    from cornelis_tpu.scene.compile import compile_scene
    from cornelis_tpu.scene.library import cornell_box

    mode = os.environ.get("DIFF_PROF_MODE", "path")
    scene = compile_scene(cornell_box())
    target = jnp.zeros((H, W, 3), jnp.float32)
    kw = dict(width=W, height=H, spp=SPP, max_depth=DEPTH, mode=mode)

    loss_fn = jax.jit(make_loss(target=target, base_scene=scene, **kw))
    params = extract_params(scene, ("mat_albedo", "mat_roughness"))
    key = jax.random.key(7)

    def _step(p, k):
        # Consume every grad leaf in the returned scalar -- returning only
        # the loss lets XLA dead-code-eliminate the entire backward pass
        # (measured: "bwd/fwd 0.4x", i.e. no backward at all).
        loss, grads = jax.value_and_grad(loss_fn)(p, k)
        return loss + sum(jnp.sum(leaf) for leaf in jax.tree.leaves(grads))

    grad_fn = jax.jit(_step)

    dt_fwd = timed(loss_fn, params, key)
    print(f"mode={mode} fwd       : {dt_fwd*1e3:8.1f} ms  "
          f"({W*H*SPP*2/dt_fwd/1e6:6.1f} Mrays/s)", flush=True)
    dt_step = timed(grad_fn, params, key)
    print(f"mode={mode} fwd+bwd   : {dt_step*1e3:8.1f} ms  "
          f"({W*H*SPP*2/dt_step/1e6:6.1f} Mrays/s)  bwd/fwd = "
          f"{dt_step/dt_fwd - 1:.1f}x", flush=True)


if __name__ == "__main__":
    main()
