import time, jax, jax.numpy as jnp
from cornelis_tpu.integrator import render_chunk
from cornelis_tpu.ops.pallas_integrator import render_chunk_pallas
from cornelis_tpu.rng import make_key
from cornelis_tpu.scene.compile import compile_scene
from cornelis_tpu.scene.library import cornell_box

scene = compile_scene(cornell_box())
key = make_key()
W=H=512; SPP=32; TOT=160; MD=64

def timeit(name, f, n=4):
    out0 = jax.block_until_ready(f(0))
    times=[]
    for i in range(n):
        t=time.perf_counter()
        out = jax.block_until_ready(f((i+1)*SPP))
        times.append(time.perf_counter()-t)
    dt = min(times)
    print(f"{name}: {W*H*SPP/dt/1e6:.1f} Mrays/s  times_ms={[round(t*1e3,1) for t in times]}  mean_px={float(out.mean()):.4f}")

def xla(off):
    return render_chunk(scene, key, jnp.uint32(off), width=W, height=H, spp_chunk=SPP, spp_total=TOT, max_depth=MD)
def pallas(off):
    return render_chunk_pallas(scene, key, jnp.uint32(off), width=W, height=H, spp_chunk=SPP, spp_total=TOT, max_depth=MD)

timeit("XLA wavefront", xla)
timeit("Pallas megakernel", pallas)
