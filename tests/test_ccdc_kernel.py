"""CCDC segmentation fixtures — twin of the reference's
tests/algorithms/test_ccdc.py golden-.npz strategy (SURVEY.md §5,
FIXTURES.md §3.4): synthetic piecewise-harmonic series with injected breaks
at known dates; assert segment count, break dates, coefficients, rmse.
Parametrized over defaults / reversed time / dynamic_rmse / consecutive."""

import numpy as np
import pytest

from yatsm_spark.kernel.ccdc import CCDCParams, ccdc_fit
from yatsm_spark.kernel.design import harmonic_design
from yatsm_spark.kernel.postprocess import (
    commission_test,
    omission_scores,
    refit_segments,
)


def make_series(seed=42, n_years=6, per_year=46, breaks=((2.0, 8.0), (4.0, -6.0)),
                noise=0.3):
    """Harmonic + trend series with level shifts at `breaks` (year, jump)."""
    rng = np.random.RandomState(seed)
    t = np.sort(rng.uniform(0, 365.25 * n_years, n_years * per_year))
    w = 2 * np.pi / 365.25
    y = 10.0 + 0.001 * t + 2.0 * np.cos(w * t) + 1.0 * np.sin(w * t)
    for yr, jump in breaks:
        y = y + np.where(t >= yr * 365.25, jump, 0.0)
    y = y + rng.normal(0, noise, len(t))
    return t, y


BREAK_DAYS = (2.0 * 365.25, 4.0 * 365.25)


@pytest.mark.parametrize("consecutive", [3, 5])
def test_segment_count_and_break_dates(consecutive):
    t, y = make_series()
    p = CCDCParams(consecutive=consecutive, screening=None)
    res = ccdc_fit(t, y, p)
    assert len(res.segments) == 3
    # break of segment i lands at the injected shift (within a few obs —
    # a noise outlier immediately before the shift may start the
    # `consecutive` run that the shift completes, and the break date is
    # attributed to the first obs of the run, as in the reference monitor).
    for seg, bd in zip(res.segments[:2], BREAK_DAYS):
        assert abs(seg.break_day - bd) < 30.0
    assert res.segments[2].break_day == 0.0


def test_coefficients_recovered():
    # noise=0.2 keeps trend/noise below the paper's slope-stability bound
    # (|slope|*span/(3*rmse) < 1) so the initial window trains first try.
    t, y = make_series(noise=0.2)
    res = ccdc_fit(t, y, CCDCParams(screening=None))
    assert len(res.segments) == 3
    # Segment 1 (before any shift): intercept ~10, trend ~0.001, cos 2, sin 1
    c = res.segments[0].coef[0]
    assert c[0] == pytest.approx(10.0, abs=0.3)
    assert c[1] == pytest.approx(0.001, abs=1e-3)
    assert c[2] == pytest.approx(2.0, abs=0.15)
    assert c[3] == pytest.approx(1.0, abs=0.15)
    # rmse near injected noise level
    assert res.segments[0].rmse[0] == pytest.approx(0.2, abs=0.08)
    # magnitude of first break ~ +8 level shift
    assert res.segments[0].magnitude[0] == pytest.approx(8.0, abs=1.5)


def test_low_noise_strong_trend_never_stabilizes():
    # With noise=0.05 the injected trend (0.001/day over a >=365d window)
    # exceeds the stability bound |slope|*span/(3*rmse) < 1, so training
    # never succeeds — the paper's intended behavior for trending windows.
    t, y = make_series(noise=0.05)
    assert ccdc_fit(t, y, CCDCParams(screening=None)).segments == []


def test_no_break_on_stable_series():
    t, y = make_series(breaks=(), noise=0.3)
    res = ccdc_fit(t, y, CCDCParams(screening=None))
    assert len(res.segments) == 1
    s = res.segments[0]
    assert s.break_day == 0.0
    assert s.start_day == t[0] and s.end_day == t[-1]


def test_reverse_run_finds_same_breaks():
    t, y = make_series()
    fwd = ccdc_fit(t, y, CCDCParams(screening=None))
    rev = ccdc_fit(t, y, CCDCParams(screening=None, reverse=True))
    assert len(rev.segments) == 3
    # Reverse-time break dates land within one inter-break span of forward's
    fwd_breaks = sorted(s.break_day for s in fwd.segments if s.break_day)
    rev_breaks = sorted(abs(s.break_day) for s in rev.segments if s.break_day)
    assert len(fwd_breaks) == len(rev_breaks) == 2
    for fb, rb in zip(fwd_breaks, rev_breaks):
        assert abs(fb - rb) < 60.0  # reverse sees the break from the other side


def test_noise_removal_prevents_false_break():
    t, y = make_series(breaks=(), noise=0.2, seed=1)
    # single gross outlier mid-series
    y2 = y.copy()
    y2[len(y2) // 2] += 50.0
    res = ccdc_fit(t, y2, CCDCParams(screening=None))
    assert len(res.segments) == 1
    assert res.segments[0].break_day == 0.0


def test_screening_drops_outliers():
    t, y = make_series(breaks=(), noise=0.2, seed=2)
    rng = np.random.RandomState(9)
    idx = rng.choice(len(y), 8, replace=False)
    y2 = y.copy()
    y2[idx] += 40.0
    res = ccdc_fit(t, y2, CCDCParams(screening="RLM"))
    assert res.screened_out[idx].all()
    assert len(res.segments) == 1


def test_dynamic_rmse_variant_still_segments():
    t, y = make_series()
    res = ccdc_fit(t, y, CCDCParams(screening=None, dynamic_rmse=True))
    assert len(res.segments) == 3


def test_multiseries_break_on_any_test_index():
    t, y = make_series()
    flat = np.full_like(y, 3.0)
    Y = np.stack([y, flat])
    res = ccdc_fit(t, Y, CCDCParams(screening=None))
    assert len(res.segments) == 3
    assert res.segments[0].coef.shape == (2, 4)
    # flat series coefficients: intercept 3, everything else ~0
    np.testing.assert_allclose(res.segments[0].coef[1], [3, 0, 0, 0], atol=1e-6)


def test_too_short_series_yields_no_segments():
    t = np.arange(10.0)
    y = np.sin(t)
    assert ccdc_fit(t, y, CCDCParams(screening=None)).segments == []


# --- frozen golden record (FIXTURES.md §3.4) --------------------------------
# Values generated once from this kernel (the engine's spec — reference mount
# was empty, SURVEY.md §0) and pinned exactly, like the reference's golden npz.

def test_frozen_golden_record():
    t, y = make_series()
    res = ccdc_fit(t, y, CCDCParams(screening=None))
    got = {
        "n_segments": len(res.segments),
        "starts": [s.start_day for s in res.segments],
        "breaks": [s.break_day for s in res.segments],
        "coef0": list(res.segments[0].coef[0]),
        "rmse": [float(s.rmse[0]) for s in res.segments],
    }
    import json, os

    golden_path = os.path.join(os.path.dirname(__file__), "data", "ccdc_golden.json")
    if not os.path.exists(golden_path):  # pragma: no cover - generation path
        os.makedirs(os.path.dirname(golden_path), exist_ok=True)
        with open(golden_path, "w") as f:
            json.dump(got, f, indent=1)
        pytest.skip("golden generated")
    with open(golden_path) as f:
        want = json.load(f)
    assert got["n_segments"] == want["n_segments"]
    np.testing.assert_allclose(got["starts"], want["starts"], rtol=0, atol=0)
    np.testing.assert_allclose(got["breaks"], want["breaks"], rtol=0, atol=0)
    np.testing.assert_allclose(got["coef0"], want["coef0"], rtol=0, atol=1e-12)
    np.testing.assert_allclose(got["rmse"], want["rmse"], rtol=0, atol=1e-12)


# --- postprocess (P1-P3) ------------------------------------------------------

def test_commission_merges_false_break():
    t, y = make_series(breaks=(), noise=0.3, seed=4)
    p = CCDCParams(screening=None)
    res = ccdc_fit(t, y, p)
    # Manufacture a false split of the single true segment:
    s = res.segments[0]
    mid = (s.start_day + s.end_day) / 2
    import dataclasses

    left = dataclasses.replace(s, end_day=float(t[t <= mid][-1]), break_day=mid)
    right = dataclasses.replace(s, start_day=float(t[t > mid][0]))
    merged = commission_test(t, y, [left, right], p)
    assert len(merged) == 1
    assert merged[0].start_day == s.start_day and merged[0].end_day == s.end_day


def test_commission_keeps_true_break():
    t, y = make_series(noise=0.2)
    p = CCDCParams(screening=None)
    res = ccdc_fit(t, y, p)
    kept = commission_test(t, y, res.segments, p)
    assert len(kept) == len(res.segments)


def test_omission_flags_missed_break():
    t, y = make_series(breaks=((3.0, 6.0),), noise=0.3, seed=5)
    p = CCDCParams(screening=None)
    # One segment spanning the whole series (pretend monitor missed it)
    from yatsm_spark.kernel.ccdc import Segment

    fake = Segment(start_day=t[0], end_day=t[-1], break_day=0.0,
                   coef=np.zeros((1, 4)), rmse=np.zeros(1),
                   magnitude=np.zeros(1), n_obs=len(t))
    scores = omission_scores(t, y, [fake], p)
    assert scores[0] > 1.63
    # whereas a clean segment scores low
    t0, y0 = make_series(breaks=(), noise=0.3, seed=6)
    clean = Segment(start_day=t0[0], end_day=t0[-1], break_day=0.0,
                    coef=np.zeros((1, 4)), rmse=np.zeros(1),
                    magnitude=np.zeros(1), n_obs=len(t0))
    assert omission_scores(t0, y0, [clean], p)[0] < 1.36


def test_refit_adds_robust_fields():
    t, y = make_series(noise=0.2)
    p = CCDCParams(screening=None)
    res = ccdc_fit(t, y, p)
    refits = refit_segments(t, y, res.segments, p, estimator="rlm_maxiter10")
    assert len(refits) == len(res.segments)
    for s, r in zip(res.segments, refits):
        assert r["coef"].shape == s.coef.shape
        # robust refit should be close to the OLS fit on clean data
        np.testing.assert_allclose(r["coef"], s.coef, atol=0.5)
