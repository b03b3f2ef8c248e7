"""The auto backend's adaptive scheduling, driven end-to-end on CPU.

The real decision only arises on an accelerator, so these tests simulate
one: `jax.default_backend` is monkeypatched to report "tpu" and
CORNELIS_PALLAS_INTERPRET=1 lowers every megakernel to interpret mode
(plain jnp on the CPU devices). That exercises the REAL session logic --
throttled dispatch while undecided, the completed-rate estimate, the
switchover to Pallas dispatches, and the process-warm fast path -- not a
mock of it.
"""

import logging

import jax
import numpy as np
import pytest

from cornelis_tpu.options import RenderOptions
from cornelis_tpu.render import RenderSession, RenderStatus
from cornelis_tpu.scene.library import sphere_on_plane

OPTS = dict(
    width=32,
    height=32,
    samples_aa=8,
    spp_chunk=2,
    max_depth=4,
    output=None,
)


@pytest.fixture
def fake_tpu(monkeypatch):
    from cornelis_tpu.ops import pallas_integrator as pk

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setenv("CORNELIS_PALLAS_INTERPRET", "1")
    monkeypatch.setattr(pk, "_PROCESS_WARM", False)
    return pk


def _render(opts, caplog):
    with caplog.at_level(logging.INFO, logger="cornelis_tpu"):
        return RenderSession(sphere_on_plane(), opts).render()


class TestAutoSwitchover:
    def test_switches_to_pallas_when_estimate_exceeds_threshold(
        self, fake_tpu, caplog
    ):
        # threshold 0 = any remaining work justifies the megakernel.
        opts = RenderOptions(backend="auto", warmup_threshold_s=0.0, **OPTS)
        result = _render(opts, caplog)
        assert result.status == RenderStatus.DONE
        assert result.progress.chunks_completed == 4
        assert any("switching the remaining" in m for m in caplog.messages)
        # A completed Pallas render marks the process warm.
        assert fake_tpu.process_is_warm()

    def test_negative_threshold_never_switches(self, fake_tpu, caplog):
        opts = RenderOptions(backend="auto", warmup_threshold_s=-1.0, **OPTS)
        result = _render(opts, caplog)
        assert result.status == RenderStatus.DONE
        assert not any("switching the remaining" in m for m in caplog.messages)
        assert not fake_tpu.process_is_warm()

    def test_warm_process_starts_on_pallas(self, fake_tpu, caplog):
        fake_tpu.mark_process_warm()
        opts = RenderOptions(backend="auto", warmup_threshold_s=600.0, **OPTS)
        result = _render(opts, caplog)
        assert result.status == RenderStatus.DONE
        # Already warm: no serving-on-XLA announcement, no switch event.
        assert not any("serving chunks on the XLA path" in m for m in caplog.messages)

    def test_schedule_is_recorded(self, fake_tpu, caplog):
        # Cold process, never-switch: all chunks on the wavefront. (Order
        # matters: a completed Pallas render would mark the process warm
        # and the auto fast path would then start on Pallas regardless of
        # the threshold.)
        opts = RenderOptions(backend="auto", warmup_threshold_s=-1.0, **OPTS)
        result = _render(opts, caplog)
        assert result.backend_schedule == ("xla",) * 4
        opts = RenderOptions(backend="auto", warmup_threshold_s=0.0, **OPTS)
        result = _render(opts, caplog)
        assert result.backend_schedule == ("pallas",) * 4

    def test_replay_schedule_reproduces_auto_render_bitwise(
        self, fake_tpu, caplog
    ):
        # A tiny positive threshold yields a MIXED schedule: leading
        # chunks run on XLA while the completed-rate estimate forms, the
        # rest switch to Pallas. Replaying that schedule must reproduce
        # the image bit-exactly even though the process is now warm (the
        # warm fast path would otherwise start chunk 0 on Pallas).
        opts_kw = dict(OPTS, samples_aa=16, spp_chunk=2)
        first = _render(
            RenderOptions(backend="auto", warmup_threshold_s=1e-9, **opts_kw),
            caplog,
        )
        assert "pallas" in first.backend_schedule
        assert fake_tpu.process_is_warm()
        replayed = _render(
            RenderOptions(
                backend="auto",
                warmup_threshold_s=1e-9,
                backend_schedule=first.backend_schedule,
                **opts_kw,
            ),
            caplog,
        )
        assert replayed.backend_schedule == first.backend_schedule
        np.testing.assert_array_equal(replayed.image, first.image)

    def test_replay_schedule_length_mismatch_raises(self, fake_tpu, caplog):
        opts = RenderOptions(
            backend="auto", backend_schedule=("xla",) * 3, **OPTS
        )
        with pytest.raises(ValueError, match="4 chunks"):
            _render(opts, caplog)

    def test_replay_schedule_bad_entry_rejected(self, fake_tpu):
        with pytest.raises(ValueError, match="entries must be"):
            RenderOptions(
                backend="auto", backend_schedule=("cuda",), **OPTS
            ).validate()
        with pytest.raises(ValueError, match="forces the wavefront"):
            RenderOptions(
                backend="xla", backend_schedule=("pallas",), **OPTS
            ).validate()

    def test_fresh_stamp_starts_on_pallas(self, fake_tpu, caplog,
                                          monkeypatch, tmp_path):
        # Device warmth outlives processes (PERF.md): a fresh stamp file
        # must let a COLD process start auto renders on the megakernel.
        monkeypatch.setenv("CORNELIS_WARMTH_STAMP_DIR", str(tmp_path))
        fake_tpu.mark_process_warm()  # writes the stamp
        monkeypatch.setattr(fake_tpu, "_PROCESS_WARM", False)  # "new" process
        assert fake_tpu.device_recently_warm(120.0)
        opts = RenderOptions(backend="auto", warmup_threshold_s=600.0, **OPTS)
        result = _render(opts, caplog)
        assert result.backend_schedule == ("pallas",) * 4
        assert any("warmth stamp" in m for m in caplog.messages)

    def test_stale_stamp_serves_on_xla(self, fake_tpu, caplog,
                                       monkeypatch, tmp_path):
        import json
        import time

        monkeypatch.setenv("CORNELIS_WARMTH_STAMP_DIR", str(tmp_path))
        fake_tpu.mark_process_warm()
        monkeypatch.setattr(fake_tpu, "_PROCESS_WARM", False)
        # Age the stamp beyond the window: warmth must not be trusted.
        path = fake_tpu._warmth_stamp_path()
        with open(path, "w") as f:
            json.dump({"ts": time.time() - 1000.0}, f)
        assert not fake_tpu.device_recently_warm(120.0)
        opts = RenderOptions(
            backend="auto", warmup_threshold_s=-1.0,
            warm_device_max_age_s=120.0, **OPTS
        )
        result = _render(opts, caplog)
        assert result.backend_schedule == ("xla",) * 4
        # warm_device_max_age_s=0 disables the check even with a fresh stamp.
        fake_tpu.mark_process_warm()
        monkeypatch.setattr(fake_tpu, "_PROCESS_WARM", False)
        assert not fake_tpu.device_recently_warm(0.0)

    def test_switched_image_matches_unswitched_in_distribution(
        self, fake_tpu, caplog
    ):
        opts_kw = dict(OPTS, samples_aa=32, spp_chunk=8)
        a = _render(
            RenderOptions(backend="auto", warmup_threshold_s=0.0, **opts_kw), caplog
        ).image
        b = _render(
            RenderOptions(backend="xla", **opts_kw), caplog
        ).image
        # Different backends/draws; means must agree within MC noise
        # (the sphere_on_plane light is small -> noisy at 32 spp; measured
        # spread ~0.05, bound 3x that).
        assert abs(float(a.mean()) - float(b.mean())) < 0.15
        assert np.isfinite(a).all()

    def test_forced_pallas_rejects_xla_schedule(self, fake_tpu):
        with pytest.raises(ValueError, match="forces the megakernel"):
            RenderOptions(
                backend="pallas", backend_schedule=("xla",), **OPTS
            ).validate()
