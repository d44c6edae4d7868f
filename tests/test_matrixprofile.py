"""Matrix profile: kernel vs an independent brute-force reference,
planted motif/discord recovery, exclusion-zone and zero-variance
conventions, and the Spark operator's plumbing + extrema reduction."""

import datetime as dt

import numpy as np
import pandas as pd
import pytest

from yatsm_spark.kernel.matrixprofile import matrix_profile_core

T0 = dt.datetime(2026, 1, 1)


def _brute(x, m, excl):
    """Independent O(n^2 m) reference: explicit z-normalization per
    window, np.linalg distances — none of the kernel's cumsum algebra."""
    x = np.asarray(x, dtype=np.float64)
    L = len(x) - m + 1
    wins = np.stack([x[i:i + m] for i in range(L)])
    mus = wins.mean(axis=1)
    sds = wins.std(axis=1)
    mp = np.full(L, np.nan)
    mpi = np.full(L, -1)
    for i in range(L):
        if sds[i] == 0:
            continue
        best = np.inf
        for off in range(excl + 1, L):
            for j in (i + off, i - off):
                if not (0 <= j < L) or sds[j] == 0:
                    continue
                zi = (wins[i] - mus[i]) / sds[i]
                zj = (wins[j] - mus[j]) / sds[j]
                d = float(np.sqrt(((zi - zj) ** 2).sum()))
                if j > i:        # right-hand neighbor first at equal off
                    if d < best:
                        best, mpi[i] = d, j
                else:
                    if d < best:
                        best, mpi[i] = d, j
        if np.isfinite(best):
            mp[i] = best
    return mp, mpi


def test_kernel_matches_bruteforce():
    rng = np.random.default_rng(42)
    x = rng.integers(0, 40, size=60)
    m, excl = 8, 4
    mp, mpi = matrix_profile_core(x, m, excl)
    ref_mp, ref_mpi = _brute(x, m, excl)
    assert mp.shape == ref_mp.shape
    nn = np.isfinite(ref_mp)
    assert np.allclose(mp[nn], ref_mp[nn], atol=1e-8)
    assert (mpi[nn] == ref_mpi[nn]).all()


def test_planted_motif_and_discord():
    # periodic background: every window has an exact period-aligned
    # twin (motif dist 0), except where the one-off discord is planted
    x = np.tile([10, 12, 14, 16, 18, 16, 14, 12], 15)   # 120 slots
    x[50:58] = [60, 2, 47, 9, 55, 1, 38, 70]            # discord
    mp, mpi = matrix_profile_core(x, 8)
    # window 0's exact twin: nearest allowed offset is the period, and
    # at equal offset the right-hand neighbor wins
    assert mp[0] == pytest.approx(0.0, abs=1e-9)
    assert mpi[0] == 8
    # the top discord window overlaps the planted anomaly
    assert int(np.nanargmax(mp)) in range(43, 58)


def test_exclusion_zone_skips_trivial_matches():
    # strictly increasing ramp: adjacent windows are near-identical
    # after z-norm; with a huge exclusion zone nothing qualifies
    x = np.arange(30)
    mp, mpi = matrix_profile_core(x, 6, excl=30)
    assert np.isnan(mp).all() and (mpi == -1).all()
    # with the default zone the nearest ALLOWED neighbor is found
    mp2, mpi2 = matrix_profile_core(x, 6)
    assert np.isfinite(mp2).all()
    assert (np.abs(mpi2 - np.arange(len(mpi2))) > 3).all()


def test_zero_variance_windows_are_null_both_sides():
    x = np.array([5] * 12 + [1, 9, 2, 8, 3, 7, 1, 9, 2, 8, 3, 7])
    mp, mpi = matrix_profile_core(x, 4)
    # windows fully inside the flat prefix have sigma == 0
    assert np.isnan(mp[:9]).all()
    # and no finite window may claim a flat window as its neighbor
    assert not np.isin(mpi[np.isfinite(mp)], np.arange(9)).any()


def test_kernel_guards():
    with pytest.raises(ValueError, match="m must be"):
        matrix_profile_core(np.arange(10), 1)
    mp, mpi = matrix_profile_core(np.arange(3), 8)   # too short
    assert mp.size == 0 and mpi.size == 0
    with pytest.raises(ValueError, match="too large"):
        matrix_profile_core(np.array([2 ** 40, 0, 2 ** 40, 1] * 4), 2)


def test_spark_operator_matches_kernel(spark):
    from yatsm_spark.operators.matrixprofile import matrix_profile

    rng = np.random.default_rng(9)
    rows = []
    series = {}
    for c in ("c1", "c2"):
        xs = rng.integers(0, 30, size=50)
        series[c] = xs
        rows += [(c, T0 + dt.timedelta(hours=int(i)), int(v))
                 for i, v in enumerate(xs)]
    df = spark.createDataFrame(
        rows, "conv_id string, window_start timestamp, turn_count long")
    got = matrix_profile(df, m=8).toPandas() \
        .sort_values(["conv_id", "idx"]).reset_index(drop=True)
    for c, xs in series.items():
        mp, mpi = matrix_profile_core(xs, 8)
        g = got[got.conv_id == c]
        assert (g["idx"].to_numpy() == np.arange(len(mp))).all()
        assert np.allclose(g["mp"].to_numpy(dtype=float), mp,
                           equal_nan=True)       # bit-path: same kernel
        got_pair = [None if pd.isna(v) else int(v) for v in g["mp_idx"]]
        want_pair = [None if v < 0 else int(v) for v in mpi]
        assert got_pair == want_pair
    # short series emits zero rows, doesn't crash
    one = spark.createDataFrame([("c", T0, 5)],
                                "conv_id string, window_start timestamp, "
                                "turn_count long")
    assert matrix_profile(one, m=8).count() == 0


def test_mp_extrema_ties_and_nulls(spark):
    from yatsm_spark.operators.matrixprofile import mp_extrema

    rows = [
        ("c1", 0, T0, 3.0, 4),
        ("c1", 1, T0, 1.0, 5),    # motif (lowest mp)
        ("c1", 2, T0, 9.0, 6),    # discord, tied with idx 3
        ("c1", 3, T0, 9.0, 7),
        ("c2", 0, T0, None, None),  # all-NULL conv drops out
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, idx long, window_start timestamp, "
              "mp double, mp_idx long")
    out = mp_extrema(df).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["motif_idx"], r["motif_pair"], r["motif_dist"]) == (1, 5, 1.0)
    assert (r["discord_idx"], r["discord_dist"]) == (2, 9.0)  # lowest idx
    assert r["n_windows"] == 4


def _brute_ab(q, y, m):
    q = np.asarray(q, dtype=float)
    y = np.asarray(y, dtype=float)
    best = None
    for i in range(len(q) - m + 1):
        qi = q[i:i + m]
        if qi.std() == 0:
            continue
        zq = (qi - qi.mean()) / qi.std()
        for j in range(len(y) - m + 1):
            yj = y[j:j + m]
            if yj.std() == 0:
                continue
            zy = (yj - yj.mean()) / yj.std()
            d = float(np.sqrt(((zq - zy) ** 2).sum()))
            if best is None or d < best[0] - 1e-12:
                best = (d, i, j)
    return best


def test_ab_best_match_vs_bruteforce():
    from yatsm_spark.kernel.matrixprofile import ab_best_match

    rng = np.random.default_rng(17)
    for _ in range(15):
        q = rng.integers(0, 25, size=int(rng.integers(8, 30)))
        y = rng.integers(0, 25, size=int(rng.integers(8, 40)))
        got = ab_best_match(q, y, 6)
        want = _brute_ab(q, y, 6)
        if want is None:
            assert got is None
        else:
            assert got[0] == pytest.approx(want[0], abs=1e-8)
            assert (got[1], got[2]) == (want[1], want[2])


def test_ab_best_match_planted_scaled_copy():
    from yatsm_spark.kernel.matrixprofile import ab_best_match

    q = np.tile([1, 2, 3, 4, 5, 6, 7, 8], 3)
    y = np.concatenate([[9] * 20, [2, 4, 6, 8, 10, 12, 14, 16],
                        [7] * 10])
    dist, qi, yj = ab_best_match(q, y, 8)
    # the 2x-scaled copy z-normalizes to the identical shape
    assert dist == pytest.approx(0.0, abs=1e-9) and yj == 20
    # all-flat corpus: no valid window anywhere
    assert ab_best_match(q, np.array([5] * 30), 8) is None
    with pytest.raises(ValueError, match="m must be"):
        ab_best_match(q, y, 1)


def test_ab_join_profile_operator(spark):
    from yatsm_spark.kernel.matrixprofile import ab_best_match
    from yatsm_spark.operators.matrixprofile import ab_join_profile

    rng = np.random.default_rng(21)
    rows, series = [], {}
    for c in ("cq", "c1", "c2"):
        xs = rng.integers(0, 20, size=30)
        series[c] = xs
        rows += [(c, T0 + dt.timedelta(hours=int(i)), int(v))
                 for i, v in enumerate(xs)]
    # a flat conv that must drop out
    rows += [("c3", T0 + dt.timedelta(hours=i), 4) for i in range(30)]
    df = spark.createDataFrame(
        rows, "conv_id string, window_start timestamp, turn_count long")
    got = {r["conv_id"]: r
           for r in ab_join_profile(df, "cq", m=8).collect()}
    assert set(got) == {"c1", "c2"}       # query + flat conv excluded
    for c in ("c1", "c2"):
        dist, qi, yj = ab_best_match(series["cq"], series[c], 8)
        r = got[c]
        assert r["dist"] == dist and (r["q_idx"], r["c_idx"]) == (qi, yj)
        assert r["window_start"] == T0 + dt.timedelta(hours=int(yj))
    with pytest.raises(Exception, match="shorter than m"):
        ab_join_profile(df, "cq", m=40).count()


def test_left_profile_semantics():
    from yatsm_spark.kernel.matrixprofile import left_profile

    x = np.tile([1, 5, 2, 8, 3, 9, 4, 7], 10)
    lp, lpi = left_profile(x, 8, w_hist=32)
    # cold start: first excl+1 windows have no left candidate
    assert np.isnan(lp[:5]).all() and (lpi[:5] == -1).all()
    # periodic steady state: exact left twin one period back (float
    # cancellation leaves ~1e-8 of residue in the 2m(1-r) form)
    assert lp[20] == pytest.approx(0.0, abs=1e-6) and lpi[20] == 12
    # left profile >= full profile pointwise (candidates are a subset)
    full, _ = matrix_profile_core(x, 8)
    both = ~np.isnan(lp) & ~np.isnan(full)
    assert (lp[both] >= full[both] - 1e-12).all()
    # bounded history: a candidate beyond w_hist is invisible
    y = np.concatenate([[1, 9, 2, 8, 3, 7, 4, 6] * 2,
                        np.arange(100, 160)])
    lp_small, lpi_small = left_profile(y, 8, w_hist=4)
    lp_big, _ = left_profile(y, 8, w_hist=64)
    assert np.nansum(lp_small >= lp_big - 1e-12) == np.sum(
        ~np.isnan(lp_small) & ~np.isnan(lp_big))
    with pytest.raises(ValueError, match="w_hist"):
        left_profile(x, 8, w_hist=0)
