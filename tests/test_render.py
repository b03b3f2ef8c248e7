"""Render session driver tests: progress callback contract, abort,
checkpoint/resume, options validation (Render.hpp:10-49 semantics)."""

import numpy as np
import pytest

from cornelis_tpu.options import RenderOptions
from cornelis_tpu.render import (
    RenderCommand,
    RenderSession,
    RenderStatus,
    render_scene,
)
from cornelis_tpu.scene.library import sphere_on_plane


def _opts(**kw):
    base = dict(
        samples_aa=4,
        width=16,
        height=16,
        max_depth=6,
        spp_chunk=2,
        output=None,
    )
    base.update(kw)
    return RenderOptions(**base)


class TestOptions:
    def test_validation(self):
        # samplesAA must be > 0 (Render.cpp:310-313).
        with pytest.raises(ValueError):
            RenderOptions(samples_aa=0).validate()
        with pytest.raises(ValueError):
            RenderOptions(width=0).validate()

    def test_auto_chunking(self):
        assert RenderOptions(samples_aa=16, width=4096, height=4096).resolved_spp_chunk() == 1
        assert RenderOptions(samples_aa=4, width=16, height=16).resolved_spp_chunk() == 4


class TestSession:
    def test_render_completes(self, tmp_path):
        out = str(tmp_path / "out.png")
        result = render_scene(sphere_on_plane(), _opts(output=out))
        assert result.status == RenderStatus.DONE
        assert result.image.shape == (16, 16, 3)
        assert np.all(np.isfinite(result.image))
        assert result.progress.samples_completed == 4
        import os

        assert os.path.exists(out)

    def test_progress_callback(self):
        events = []

        def cb(progress, status):
            events.append((progress.chunks_completed, status))
            return RenderCommand.CONTINUE

        result = render_scene(sphere_on_plane(), _opts(), on_progress=cb)
        assert result.status == RenderStatus.DONE
        # Called at least once (Render.hpp:38) + final Done.
        assert any(s == RenderStatus.RUNNING for _, s in events)
        assert events[-1][1] == RenderStatus.DONE
        assert events[-1][0] == 2  # 4 spp / 2 per chunk

    def test_progress_counts_completed_not_dispatched(self):
        """Honest progress (VERDICT r2 #2): `chunks_completed` tracks work
        the device has FINISHED (verified by a completion probe), never runs
        ahead of the dispatch frontier, is monotone, and lands exactly on
        the target when the render returns."""
        events = []

        def cb(p, status):
            events.append((p.chunks_dispatched, p.chunks_completed, status))
            return RenderCommand.CONTINUE

        result = render_scene(sphere_on_plane(), _opts(), on_progress=cb)
        assert result.status == RenderStatus.DONE
        prev_done = 0
        for dispatched, done, _ in events:
            assert done <= dispatched <= result.progress.chunks_target
            assert done >= prev_done  # monotone completion
            prev_done = done
        # Final record: everything completed, and the rate was recomputed
        # over completed (not merely dispatched) work.
        assert result.progress.chunks_completed == result.progress.chunks_target
        assert result.progress.samples_completed == result.progress.samples_target
        assert result.progress.rays_per_second > 0

    def test_abort(self):
        def cb(progress, status):
            if status == RenderStatus.RUNNING:
                return RenderCommand.ABORT
            return RenderCommand.CONTINUE

        result = render_scene(sphere_on_plane(), _opts(), on_progress=cb)
        assert result.status == RenderStatus.ABORTED
        # Partial image is still usable (progressive accumulation).
        assert result.film.sample_count == 2

    def test_checkpoint_resume_matches_straight_run(self, tmp_path):
        ckpt = str(tmp_path / "c.npz")

        # Run 1: abort after the first chunk, checkpointing.
        def abort_cb(progress, status):
            return RenderCommand.ABORT if status == RenderStatus.RUNNING else RenderCommand.CONTINUE

        render_scene(sphere_on_plane(), _opts(checkpoint=ckpt), on_progress=abort_cb)

        # Run 2: resume to completion.
        resumed = render_scene(sphere_on_plane(), _opts(checkpoint=ckpt))
        assert resumed.film.sample_count == 4

        # Straight run: must match the resumed render (counter-based RNG).
        straight = render_scene(sphere_on_plane(), _opts())
        assert np.allclose(resumed.image, straight.image, rtol=1e-4, atol=1e-5)

    def test_session_reuse(self):
        session = RenderSession(sphere_on_plane(), _opts())
        a = session.render()
        b = session.render()
        assert np.array_equal(a.image, b.image)


class TestTimeBudget:
    def test_budget_stops_early_and_normalizes(self):
        # A vanishing budget stops after the first chunk; the image is
        # normalized by the samples actually taken (progressive mode, the
        # reference's README Milestone 4).
        result = render_scene(
            sphere_on_plane(), _opts(samples_aa=64, time_budget_s=1e-6)
        )
        assert result.status == RenderStatus.DONE
        assert result.film.sample_count == 2  # exactly one 2-spp chunk
        full = render_scene(sphere_on_plane(), _opts(samples_aa=2))
        assert np.allclose(result.image, full.image, rtol=1e-5, atol=1e-6)

    def test_zero_budget_renders_everything(self):
        result = render_scene(sphere_on_plane(), _opts(time_budget_s=0.0))
        assert result.film.sample_count == 4

    def test_negative_budget_rejected(self):
        with pytest.raises(ValueError):
            _opts(time_budget_s=-1.0).validate()
