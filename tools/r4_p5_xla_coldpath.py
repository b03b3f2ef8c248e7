"""Round-4 TPU batch, process 5: decompose the XLA first-chunk latency.

P2 measured ~50-80 s to the first completed XLA chunk in a FRESH process
even with a populated persistent compile cache -- so is the cost host
compile (cache miss?) or device-side executable load/init? This times the
stages explicitly for the default session's chunk shape (512x512x32):

  t_lower    : jit trace + HLO lower
  t_compile  : backend compile (persistent-cache hit should make this ~s)
  t_first    : first execution to completion (device_barrier)
  t_second   : second execution

Writes /tmp/r4_p5_xla_coldpath.json.
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

    import jax.numpy as jnp

    from cornelis_tpu.integrator import render_chunk
    from cornelis_tpu.rng import make_key
    from cornelis_tpu.scene.compile import compile_scene
    from cornelis_tpu.scene.library import cornell_box
    from cornelis_tpu.utils.barrier import device_barrier

    scene = compile_scene(cornell_box())
    key = make_key()
    kw = dict(width=512, height=512, spp_chunk=32, spp_total=256, max_depth=64)

    out = {}
    t0 = time.time()
    lowered = render_chunk.lower(scene, key, jnp.uint32(0), **kw)
    out["t_lower"] = round(time.time() - t0, 2)
    t0 = time.time()
    compiled = lowered.compile()
    out["t_compile"] = round(time.time() - t0, 2)
    t0 = time.time()
    r = compiled(scene, key, jnp.uint32(0))
    device_barrier(r)
    out["t_first_exec"] = round(time.time() - t0, 2)
    t0 = time.time()
    r = compiled(scene, key, jnp.uint32(32))
    device_barrier(r)
    out["t_second_exec"] = round(time.time() - t0, 2)

    print(json.dumps(out), flush=True)
    with open("/tmp/r4_p5_xla_coldpath.json", "w") as f:
        json.dump(out, f, indent=1)
    print("P5 DONE", flush=True)


if __name__ == "__main__":
    main()
