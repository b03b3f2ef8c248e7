import time, jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from cornelis_tpu.ops.pallas_integrator import render_chunk_pallas
from cornelis_tpu.rng import make_key
from cornelis_tpu.scene.compile import compile_scene
from cornelis_tpu.scene.library import cornell_box

scene = compile_scene(cornell_box())
key = make_key()
W=H=512; SPP=32
def chunk(off):
    return render_chunk_pallas(scene, key, np.uint32(off), width=W, height=H,
        spp_chunk=SPP, spp_total=SPP*5, max_depth=64)
print("warmup...", flush=True)
t0=time.perf_counter()
jax.block_until_ready(chunk(0))
print(f"warmup done {time.perf_counter()-t0:.1f}s", flush=True)
for rep in range(4):
    t0=time.perf_counter()
    jax.block_until_ready(chunk((rep+1)*SPP))
    dt=time.perf_counter()-t0
    print(f"rep{rep}: {W*H*SPP/dt/1e6:.1f} Mrays/s  ({dt*1e3:.0f} ms)", flush=True)
