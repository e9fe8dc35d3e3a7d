"""Consistency tests for the MFU/roofline accounting (nanocall_tpu/roofline)."""

import numpy as np

from nanocall_tpu import roofline


def test_itemized_totals_consistent():
    for n in (64, 4096):
        fwd = roofline.grouped_forward_ops_per_event(n)
        assert fwd["total"] == sum(v for k, v in fwd.items() if k != "total")
        tb = roofline.grouped_traceback_ops_per_event(n)
        assert tb["total"] == sum(v for k, v in tb.items() if k != "total")
        dec = roofline.decode_ops_per_event(n)
        assert dec["total"] == fwd["total"] + tb["total"]


def test_ops_model_magnitude():
    """The K=6 production figure the bench uses: ~47 ops/state forward,
    ~3 ops/state traceback (the numbers PERFORMANCE.md cites)."""
    n = 4096
    fwd = roofline.grouped_forward_ops_per_event(n)["total"]
    assert 40 * n < fwd < 55 * n
    tb = roofline.grouped_traceback_ops_per_event(n)["total"]
    assert 3 * n <= tb < 4 * n


def test_fma_peak_runs_on_cpu():
    """The microbenchmark itself must run (tiny shape, CPU backend)."""
    peak, dt = roofline.measure_fma_peak(4, 256, T=32, k=4, n_iter=1)
    assert peak > 0 and dt > 0


def test_mfu_report_fields():
    rep = roofline.mfu_report(128, 8192, 4096, decode_s=0.16,
                              fma_peak_ops_per_s=1e13)
    assert rep["achieved_vpu_ops_per_s"] > 0
    assert 0 < rep["mfu_vs_measured_fma_peak"] < 10
    achieved = 128 * 8192 * roofline.decode_ops_per_event(4096)["total"] / 0.16
    assert np.isclose(rep["achieved_vpu_ops_per_s"], achieved)
