"""Unit tests for the session's completion tracker (render._CompletionTracker)
and the shared device barrier -- the machinery behind honest progress and
the adaptive backend switchover (render.py module docstring). The TPU-only
switchover itself can't run on CPU CI; these pin the pieces it is built
from.
"""

import threading
import time

import jax.numpy as jnp
import numpy as np

from cornelis_tpu.render import _CompletionTracker
from cornelis_tpu.utils.barrier import completion_probe, device_barrier


class TestBarrier:
    def test_device_barrier_returns_input(self):
        x = jnp.arange(8.0)
        assert device_barrier(x) is x

    def test_completion_probe_is_scalar(self):
        p = completion_probe(jnp.ones((4, 4, 3)))
        assert p.shape == ()
        assert float(p) == 48.0

    def test_barrier_handles_uint32(self):
        device_barrier(jnp.arange(16, dtype=jnp.uint32))


class TestCompletionTracker:
    def test_counts_reach_submitted(self):
        tr = _CompletionTracker()
        for k in range(5):
            tr.track(jnp.full((2, 2, 3), float(k)), num_samples=4)
        assert tr.wait(timeout=30.0)
        chunks, samples = tr.counts()
        assert chunks == 5 and samples == 20
        assert tr.all_done()
        tr.close()

    def test_wait_for_inflight_below(self):
        tr = _CompletionTracker()
        tr.track(jnp.ones((2, 2, 3)), num_samples=1)
        # Completion happens on the watcher thread; with limit 1 this blocks
        # until the chunk completes -- must return promptly on CPU.
        tr.wait_for_inflight_below(1)
        assert tr.counts()[0] == 1
        tr.close()

    def test_steady_rate_excludes_first_chunk(self):
        tr = _CompletionTracker()
        assert tr.steady_rate(100) is None  # no completions yet
        for _ in range(3):
            tr.track(jnp.ones((2, 2, 3)), num_samples=2)
        assert tr.wait(timeout=30.0)
        rate = tr.steady_rate(rays_per_sample=100)
        # 2 samples x 100 rays per post-first chunk over a tiny dt: positive
        # and finite is the contract (magnitude is wall-clock dependent).
        assert rate is None or (rate > 0 and np.isfinite(rate))
        tr.close()

    def test_close_stops_watcher(self):
        tr = _CompletionTracker()
        tr.track(jnp.ones((2, 2, 3)), num_samples=1)
        assert tr.wait(timeout=30.0)
        tr.close()
        tr._thread.join(timeout=10.0)
        assert not tr._thread.is_alive()

    def test_tracker_is_thread_safe_under_concurrent_tracking(self):
        tr = _CompletionTracker()

        def submit(n):
            for _ in range(n):
                tr.track(jnp.ones((2, 2, 3)), num_samples=1)

        threads = [threading.Thread(target=submit, args=(10,)) for _ in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert tr.wait(timeout=60.0)
        assert tr.counts() == (40, 40)
        tr.close()
