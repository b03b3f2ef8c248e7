import time, jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
t0=time.perf_counter()
from cornelis_tpu.ops import pallas_integrator as P
from cornelis_tpu.rng import make_key
from cornelis_tpu.scene.compile import compile_scene
from cornelis_tpu.scene.library import cornell_box
print(f"imports {time.perf_counter()-t0:.1f}s", flush=True)

t0=time.perf_counter(); scene = compile_scene(cornell_box()); jax.block_until_ready(scene.sphere_radius)
print(f"compile_scene {time.perf_counter()-t0:.1f}s", flush=True)
t0=time.perf_counter(); key = make_key(); host = P.scene_to_host(scene)
print(f"scene_to_host {time.perf_counter()-t0:.1f}s", flush=True)

W=H=512; SPP=32; rows=P.DEFAULT_ROWS
num_px=W*H; n=num_px*SPP; block=rows*P.LANES
n_pad=(n+block-1)//block*block; nb=n_pad//block
t0=time.perf_counter()
px = jnp.repeat(jnp.arange(num_px, dtype=jnp.uint32), SPP).reshape(nb*rows, P.LANES)
si = jnp.tile(jnp.arange(SPP, dtype=jnp.uint32), num_px).reshape(nb*rows, P.LANES)
jax.block_until_ready((px, si))
print(f"px/si build {time.perf_counter()-t0:.1f}s", flush=True)

t0=time.perf_counter()
renderer = P._build_renderer(host, W, H, 64, nb, rows, False, "uniform", 8, "path")
print(f"_build_renderer {time.perf_counter()-t0:.1f}s", flush=True)

from cornelis_tpu.sampling import hash32
key_words = jax.random.key_data(key).astype(jnp.uint32).reshape(2)
sr = hash32(jax.random.bits(jax.random.fold_in(key, 0x50B0), (), jnp.uint32))
key2 = jnp.concatenate([key_words, sr.reshape(1)]).reshape(1, 3)

t0=time.perf_counter(); lowered = renderer.lower(key2, px, si)
print(f"lower {time.perf_counter()-t0:.1f}s", flush=True)
t0=time.perf_counter(); compiled = lowered.compile()
print(f"compile {time.perf_counter()-t0:.1f}s", flush=True)
t0=time.perf_counter(); jax.block_until_ready(compiled(key2, px, si))
print(f"first exec {time.perf_counter()-t0:.1f}s", flush=True)
t0=time.perf_counter(); jax.block_until_ready(compiled(key2, px, si))
print(f"second exec {time.perf_counter()-t0:.2f}s", flush=True)
