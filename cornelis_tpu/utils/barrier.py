"""Reliable device-completion barriers (and the reproducer that motivates
them).

``jax.block_until_ready`` is documented to block until the computation
backing an array has completed, and it does on directly-attached backends.
Over the tunneled ``axon`` TPU backend this deployment runs on, it can
return before remote execution finishes. Reproducer, recorded 2026-08-21 on
a TPU v5e behind the tunnel (fresh process, Pallas megakernel at
64x64x16spp):

    out = chunk_fn(key, offset)     # async dispatch            3.45 s
    jax.block_until_ready(out)      # returns immediately       0.00 s
    np.asarray(out)                 # actual completion wait  125.01 s
    np.asarray(chunk_fn(key, o2))   # warm second dispatch      0.05 s

If block_until_ready honored its contract, the np.asarray on the third line
would be a pure 48 KB transfer, not a two-minute wait. (The wait itself is
the per-process megakernel first-execution cost -- see PERF.md -- but the
point here is that block_until_ready claimed completion 125 s early.) This
looks like a transport bug worth upstreaming; until then, fetching a scalar
*reduction* of the result is the only barrier that holds on every backend:
the device must finish the computation to produce the sum, and the transfer
is 4 bytes.

These helpers centralize that workaround -- it was previously copy-pasted
in bench.py, benchmarks/tpu_probe.py, and benchmarks/perf_probe.py. When
the transport is fixed, delete the bodies and forward to
jax.block_until_ready.
"""

from __future__ import annotations

import functools


@functools.cache
def _reducer():
    import jax
    import jax.numpy as jnp

    # One tiny executable reused for every probe; float32 accumulate so
    # uint32 images cannot overflow into an error.
    return jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))


def completion_probe(x):
    """A 0-d device scalar whose host fetch blocks until `x` is computed.

    The probe itself is dispatched asynchronously: call this right after
    dispatching `x`, hand the probe to another thread, and fetch it there
    (float(probe)) to learn when the device REALLY finished -- without
    transferring the full result.
    """
    return _reducer()(x)


def device_barrier(x):
    """Block until every array in the pytree `x` has actually been computed
    on its device; returns `x`. Unlike jax.block_until_ready, this holds on
    the tunneled axon backend (see module docstring)."""
    import jax

    for leaf in jax.tree.leaves(x):
        float(completion_probe(leaf))
    return x
