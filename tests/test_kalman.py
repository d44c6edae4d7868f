"""kernel/kalman.py + operators/kalman.py: filter/smoother semantics the
golden differential (tx_kalman driver row) can't isolate."""

import numpy as np
import pandas as pd
import pytest

from yatsm_spark.kernel.kalman import kalman_local_level


def test_constant_series_locks_onto_level():
    level, var, smooth = kalman_local_level(np.full(50, 7.0), q=0.01, r=4.0)
    assert abs(level[-1] - 7.0) < 1e-9
    assert np.allclose(smooth, 7.0, atol=1e-9)
    # steady-state variance is positive and decreasing from the prior
    assert 0 < var[-1] < var[0]


def test_step_change_tracked_with_lag():
    y = np.concatenate([np.zeros(40), np.full(40, 10.0)])
    level, _, smooth = kalman_local_level(y, q=1.0, r=4.0)
    assert level[39] < 1.0 and level[-1] > 9.0
    # the smoother anticipates the step (backward pass sees the future)
    assert smooth[39] > level[39]


def test_nan_slots_are_predict_only():
    y = np.array([5.0, np.nan, np.nan, 5.0, 5.0])
    level, var, smooth = kalman_local_level(y, q=1.0, r=4.0)
    assert np.all(np.isfinite(level))
    # prediction carries the last mean through the gap
    assert level[1] == level[0] and level[2] == level[0]
    # but uncertainty grows during the gap
    assert var[2] > var[0]


def test_all_nan_and_empty():
    lv, va, sm = kalman_local_level(np.full(4, np.nan))
    assert np.all(np.isnan(lv)) and np.all(np.isnan(sm))
    lv, va, sm = kalman_local_level(np.empty(0))
    assert lv.size == 0 and sm.size == 0


def test_smoother_beats_filter_on_white_noise():
    rng = np.random.RandomState(7)
    truth = np.cumsum(rng.normal(0, 0.5, 300))
    y = truth + rng.normal(0, 2.0, 300)
    level, _, smooth = kalman_local_level(y, q=0.25, r=4.0)
    rmse_f = float(np.sqrt(np.mean((level - truth) ** 2)))
    rmse_s = float(np.sqrt(np.mean((smooth - truth) ** 2)))
    assert rmse_s < rmse_f  # RTS uses future data; must not be worse


def test_operator_matches_kernel_per_group(spark):
    from yatsm_spark.operators.kalman import kalman_smooth

    rows = []
    for conv, base in [("a", 3), ("b", 20)]:
        for i in range(30):
            rows.append((conv, pd.Timestamp("2026-01-01") + pd.Timedelta(hours=i),
                         base + (i % 5)))
    pdf = pd.DataFrame(rows, columns=["conv_id", "window_start", "turn_count"])
    out = (kalman_smooth(spark.createDataFrame(pdf), "turn_count")
           .toPandas().sort_values(["conv_id", "window_start"])
           .reset_index(drop=True))
    for conv, g in pdf.groupby("conv_id"):
        lv, va, sm = kalman_local_level(
            g["turn_count"].to_numpy(np.float64))
        got = out[out.conv_id == conv]
        assert np.array_equal(got["kalman_level"].to_numpy(), lv)
        assert np.array_equal(got["kalman_smooth"].to_numpy(), sm)


def test_operator_max_n_guard_raises(spark):
    from yatsm_spark.operators.kalman import kalman_smooth

    pdf = pd.DataFrame({
        "conv_id": ["a"] * 10,
        "window_start": pd.date_range("2026-01-01", periods=10, freq="h"),
        "turn_count": range(10),
    })
    with pytest.raises(Exception, match="max_n"):
        kalman_smooth(spark.createDataFrame(pdf), "turn_count",
                      max_n=5).collect()
