"""Child process for tests/test_multiprocess.py: one rank of a 2-process
CPU render.

Usage: python _mp_render_child.py <process_id> <coordinator_port> <out.npy>

Each rank initializes jax.distributed, joins a global (4, 1) mesh (2 ranks x
2 virtual CPU devices), renders the same small Cornell frame through the
REAL RenderSession (exercising render.py's globally-sharded film drain,
i.e. the process_allgather path), and rank 0 writes the linear image to
<out.npy>. The parent compares it against a single-process render -- the
multi-host analog of the reference actually rendering on its TBB pool
(src/Render.cpp:335-354), not just initializing it.
"""

import sys

sys.path.insert(0, sys.argv[4] if len(sys.argv) > 4 else ".")

import jax

jax.config.update("jax_platforms", "cpu")

process_id = int(sys.argv[1])
port = sys.argv[2]
out_path = sys.argv[3]

jax.distributed.initialize(
    coordinator_address=f"localhost:{port}",
    num_processes=2,
    process_id=process_id,
)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()

import numpy as np

from cornelis_tpu.options import RenderOptions
from cornelis_tpu.render import RenderSession, RenderStatus
from cornelis_tpu.scene.library import cornell_box

mode = sys.argv[5] if len(sys.argv) > 5 else "plain"
kw = dict(
    width=64,
    height=64,
    samples_aa=4,
    spp_chunk=2,
    max_depth=8,
    mesh_shape=(4, 1),
    backend="xla",
    output=None,
)
if mode == "budget":
    # Exercises the rank-agreed time-budget break and the rank-0-only
    # checkpoint write (divergent local clocks must not deadlock the
    # collectives -- render.py `agree`).
    kw.update(time_budget_s=0.001, checkpoint=out_path + f".ck.npz")
result = RenderSession(cornell_box(), RenderOptions(**kw)).render()
assert result.status == RenderStatus.DONE, result.status
if mode == "budget":
    assert result.film.sample_count >= 2  # at least the first chunk landed

if process_id == 0:
    np.save(out_path, result.image)
print(f"[rank {process_id}] ok mean={float(result.image.mean()):.6f}", flush=True)
