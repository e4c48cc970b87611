"""Profiling/tracing hooks (SURVEY.md §5 tracing subsystem)."""

import os

import numpy as np

from ldpc_tpu import BpOsdDecoder
from ldpc_tpu.codes import rep_code
from ldpc_tpu.utils import StageTimer, annotate, profile_decode, trace


def test_stage_timer_accumulates():
    t = StageTimer()
    with t.stage("a"):
        x = sum(range(1000))
    with t.stage("a"):
        x += sum(range(1000))
    with t.stage("b"):
        pass
    rep = t.report()
    assert set(rep) == {"a", "b"}
    assert t.counts["a"] == 2 and rep["a"] >= 0.0
    assert "a" in t.pretty() and "ms" in t.pretty()
    assert x > 0


def test_annotate_and_trace(tmp_path):
    import jax.numpy as jnp

    with trace(str(tmp_path)):
        with annotate("square"):
            y = jnp.arange(8.0) ** 2
    assert float(y[3]) == 9.0
    # the profiler wrote something under the log dir
    assert any(os.scandir(str(tmp_path)))


def test_profile_decode_reports_stages():
    H = rep_code(20)
    dec = BpOsdDecoder(
        H, error_rate=0.05, max_iter=10, bp_method="ms", osd_order=0
    )
    rng = np.random.default_rng(0)
    errors = (rng.random((64, 20)) < 0.05).astype(np.uint8)
    syn = (errors @ np.asarray(H.todense()).T % 2).astype(np.uint8)
    rep = profile_decode(dec, syn, repeats=2)
    assert rep["compile"] > 0 and rep["decode"] > 0
    assert rep["syndromes_per_sec"] > 0
