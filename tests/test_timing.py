"""Tracing/profiling subsystem (core/timing.py, SURVEY §5.1)."""
import numpy as np
import pytest

from xmipp3_tpu.core import timing


def test_timed_phase_accumulates():
    timing.enable_timing(True)
    timing._ACCUM.clear()
    with timing.timed_phase("unit_phase"):
        sum(range(1000))
    with timing.timed_phase("unit_phase"):
        sum(range(1000))
    rep = timing.timing_report()
    assert "unit_phase" in rep and "2 calls" in rep
    timing.enable_timing(False)
    timing._ACCUM.clear()


def test_timed_phase_noop_when_disabled():
    timing.enable_timing(False)
    timing._ACCUM.clear()
    with timing.timed_phase("hidden"):
        pass
    assert not timing._ACCUM


@pytest.mark.slow
def test_trace_scope(tmp_path):
    import jax.numpy as jnp
    d = str(tmp_path / "tr")
    with timing.trace(d):
        float(jnp.ones((64, 64)).sum())
    import os
    assert os.path.isdir(d) and os.listdir(d)     # xprof artifacts written


def test_program_flag(tmp_path):
    # --trace on any program writes a trace dir; -v 2 prints phase timing
    from xmipp3_tpu.core.image import Image
    from xmipp3_tpu.programs import get_program
    rng = np.random.default_rng(0)
    Image(rng.normal(size=(4, 16, 16)).astype(np.float32)
          ).write(f"{tmp_path}/s.mrcs")
    p = get_program("image_statistics")
    p.read(["xmipp_image_statistics", "-i", f"{tmp_path}/s.mrcs",
            "--trace", f"{tmp_path}/tr2"])
    assert p.tryRun() == 0
    import os
    assert os.path.isdir(f"{tmp_path}/tr2")
