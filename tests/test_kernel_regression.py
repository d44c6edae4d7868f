"""Regression-math fixtures, mirroring the reference's
tests/regression/test_transforms.py, test_robust_fit.py, test_recresid.py,
test_diagnostics.py (SURVEY.md §5; FIXTURES.md §3.1–3.3)."""

import numpy as np
import pytest

from yatsm_spark.kernel.design import harm, harmonic_design, n_coef
from yatsm_spark.kernel.diagnostics import rmse
from yatsm_spark.kernel.fit import OLS, Lasso, RLM, make_estimator
from yatsm_spark.kernel.recresid import recresid, cusum_efp
from yatsm_spark.kernel.robust import bisquare, mad, rlm_fit


# --- harm / design (test_transforms.py twin) --------------------------------

def test_harm_columns():
    x = np.array([0.0, 365.25 / 4, 365.25 / 2])
    h = harm(x, 1)
    expected = np.array([[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0]])
    np.testing.assert_allclose(h, expected, atol=1e-12)


def test_harmonic_design_column_order():
    # patsy "1 + x + harm(x, 2)" order: 1, x, cos1, sin1, cos2, sin2
    t = np.linspace(0, 730.5, 200)
    X = harmonic_design(t, order=2)
    assert X.shape == (200, n_coef(order=2))
    np.testing.assert_allclose(X[:, 0], 1.0)
    np.testing.assert_allclose(X[:, 1], t)
    w = 2 * np.pi / 365.25
    np.testing.assert_allclose(X[:, 2], np.cos(w * t), atol=1e-12)
    np.testing.assert_allclose(X[:, 3], np.sin(w * t), atol=1e-12)
    np.testing.assert_allclose(X[:, 4], np.cos(2 * w * t), atol=1e-12)
    np.testing.assert_allclose(X[:, 5], np.sin(2 * w * t), atol=1e-12)


def test_design_recovers_harmonic_signal():
    rng = np.random.RandomState(42)
    t = np.sort(rng.uniform(0, 365.25 * 3, 300))
    w = 2 * np.pi / 365.25
    y = 5.0 + 0.01 * t + 2.0 * np.cos(w * t) - 1.5 * np.sin(w * t)
    X = harmonic_design(t, order=1)
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    np.testing.assert_allclose(beta, [5.0, 0.01, 2.0, -1.5], atol=1e-9)


# --- rmse (test_diagnostics.py twin) ----------------------------------------

def test_rmse():
    y = np.array([1.0, 2.0, 3.0])
    yhat = np.array([1.0, 1.0, 5.0])
    assert rmse(y, yhat) == pytest.approx(np.sqrt((0 + 1 + 4) / 3))


# --- robust (test_robust_fit.py twin) ---------------------------------------

def test_mad_gaussian_consistency():
    rng = np.random.RandomState(0)
    r = rng.normal(0, 2.0, 200_000)
    assert mad(r) == pytest.approx(2.0, rel=0.02)


def test_bisquare_window():
    r = np.array([0.0, 4.685, 10.0, -2.0])
    w = bisquare(r)
    assert w[0] == 1.0
    assert w[1] == 0.0
    assert w[2] == 0.0
    assert 0 < w[3] < 1


def test_rlm_rejects_gross_outliers():
    rng = np.random.RandomState(42)
    t = np.sort(rng.uniform(0, 730, 200))
    X = harmonic_design(t, order=1)
    beta_true = np.array([10.0, 0.005, 3.0, -2.0])
    y = X @ beta_true + rng.normal(0, 0.1, 200)
    out_idx = rng.choice(200, 10, replace=False)
    y_dirty = y.copy()
    y_dirty[out_idx] += 50.0  # 5% gross outliers
    ols = np.linalg.lstsq(X, y_dirty, rcond=None)[0]
    rob = rlm_fit(X, y_dirty).coef
    # robust fit must be much closer to truth than OLS
    assert np.abs(rob - beta_true).max() < 0.05
    assert np.abs(ols - beta_true).max() > 0.5
    # and outliers get ~zero weight
    w = rlm_fit(X, y_dirty).weights
    assert w[out_idx].max() < 1e-6


# Frozen golden (FIXTURES.md §3.2): generated once from this kernel, pinned.
def test_rlm_frozen_golden():
    rng = np.random.RandomState(7)
    t = np.arange(0, 100, 2.5)
    X = np.column_stack([np.ones_like(t), t])
    y = 1.0 + 0.5 * t + rng.normal(0, 0.2, len(t))
    y[5] += 30.0
    y[20] -= 25.0
    res = rlm_fit(X, y)
    np.testing.assert_allclose(
        res.coef, [1.0021268105944992, 0.49930510525655364], rtol=0, atol=1e-12
    )
    assert res.weights[5] == 0.0 and res.weights[20] == 0.0


# --- recresid (test_recresid.py twin) ----------------------------------------

def _brute_force_recresid(X, y, span):
    out = []
    for r in range(span, len(y)):
        b = np.linalg.lstsq(X[:r], y[:r], rcond=None)[0]
        xtx_inv = np.linalg.pinv(X[:r].T @ X[:r])
        fr = 1.0 + X[r] @ xtx_inv @ X[r]
        out.append((y[r] - X[r] @ b) / np.sqrt(fr))
    return np.array(out)


def test_recresid_matches_bruteforce():
    rng = np.random.RandomState(3)
    t = np.arange(50.0)
    X = np.column_stack([np.ones_like(t), t, np.cos(0.3 * t)])
    y = X @ np.array([2.0, -0.1, 1.0]) + rng.normal(0, 1.0, 50)
    w = recresid(X, y)
    np.testing.assert_allclose(w, _brute_force_recresid(X, y, 3), atol=1e-10)


def test_recresid_zero_under_null():
    # Perfect linear data -> recursive residuals exactly zero.
    t = np.arange(30.0)
    X = np.column_stack([np.ones_like(t), t])
    y = 3.0 + 2.0 * t
    np.testing.assert_allclose(recresid(X, y), 0.0, atol=1e-9)


def test_cusum_detects_shift():
    rng = np.random.RandomState(11)
    t = np.arange(120.0)
    X = np.column_stack([np.ones_like(t)])
    y = rng.normal(0, 1, 120)
    y[60:] += 5.0  # structural break
    stat_break = np.max(np.abs(cusum_efp(recresid(X, y))))
    y0 = rng.normal(0, 1, 120)
    stat_null = np.max(np.abs(cusum_efp(recresid(X, y0))))
    assert stat_break > 1.63  # 1% Brownian-bridge crit
    assert stat_break > 3 * stat_null


# --- estimators ---------------------------------------------------------------

def test_ols_and_registry():
    t = np.arange(40.0)
    X = np.column_stack([np.ones_like(t), t])
    y = 2.0 + 0.25 * t
    for name in ("OLS", "Lasso20", "rlm_maxiter10"):
        est = make_estimator(name)
        est.fit(X, y)
        assert est.predict(X).shape == y.shape
    np.testing.assert_allclose(OLS().fit(X, y).coef_, [2.0, 0.25], atol=1e-10)


def test_lasso_shrinks_and_matches_sklearn_when_available():
    rng = np.random.RandomState(5)
    X = np.column_stack([np.ones(100), rng.normal(0, 1, (100, 3))])
    beta = np.array([1.0, 5.0, 0.0, -3.0])
    y = X @ beta + rng.normal(0, 0.1, 100)
    ours = Lasso(alpha=0.1).fit(X, y).coef_
    try:
        from sklearn.linear_model import Lasso as SkLasso
    except ImportError:
        assert abs(ours[2]) < 0.05  # the zero coef stays near zero
        return
    sk = SkLasso(alpha=0.1, fit_intercept=False, max_iter=10000, tol=1e-10)
    # sklearn penalizes all coefs incl. our intercept column -> compare by
    # fitting without intercept handling on the same matrix, but exempt
    # column 0 is ours only; use a no-ones matrix for a strict comparison.
    sk.fit(X[:, 1:], y - y.mean())
    ours_no_int = Lasso(alpha=0.1).fit(
        np.column_stack([np.ones(100), X[:, 1:]]), y
    ).coef_
    np.testing.assert_allclose(ours_no_int[1:], sk.coef_, atol=0.05)


def test_glmnet_lasso_registry_and_scale_sensitivity():
    """glmnet_Lasso20 penalizes STANDARDIZED coefficients: with a
    mixed-scale design (trend in epoch-days ~1e4 vs unit harmonics) its
    shrinkage pattern differs from the raw-scale Lasso, while on an
    already-unit-variance design the two agree."""
    from yatsm_spark.kernel.fit import GlmnetLasso, make_estimator

    rng = np.random.RandomState(11)
    n = 300
    t = 20_000.0 + np.arange(n) / 100.0            # epoch-days, 3 cycles, huge offset
    X = harmonic_design(t, order=1, period=1.0)    # [1, t, cos, sin]
    y = 3.0 + 0.5 * np.sin(2 * np.pi * t) + rng.normal(0, 0.3, n)

    g = make_estimator("glmnet_Lasso20")
    g.fit(X, y)
    assert g.predict(X).shape == y.shape
    # moderate alpha: raw-scale Lasso kills the tiny-scale harmonic coefs
    # long before it touches the huge-scale trend; glmnet shrinks evenly.
    a = 0.3
    raw = Lasso(alpha=a).fit(X, y).coef_
    gln = GlmnetLasso(alpha=a).fit(X, y).coef_
    assert abs(raw[3]) < 1e-9          # sin coef zeroed at raw scale
    assert abs(gln[3]) > 0.05          # survives standardized penalty
    # back-transform sanity: glmnet fit still predicts well
    assert rmse(y, GlmnetLasso(alpha=0.001).fit(X, y).predict(X)) < 0.5

    # unit-variance design: glmnet == plain lasso (same objective)
    Z = np.column_stack([np.ones(n), rng.normal(0, 1, (n, 3))])
    Z[:, 1:] = (Z[:, 1:] - Z[:, 1:].mean(0)) / Z[:, 1:].std(0)
    yz = Z @ np.array([1.0, 2.0, 0.0, -1.5]) + rng.normal(0, 0.1, n)
    np.testing.assert_allclose(GlmnetLasso(alpha=0.05).fit(Z, yz).coef_,
                               Lasso(alpha=0.05).fit(Z, yz).coef_, atol=1e-4)


def test_glmnet_lasso_alpha0_matches_ols():
    rng = np.random.RandomState(7)
    t = np.linspace(0.0, 10.0, 120)
    X = harmonic_design(t, order=1, period=1.0)
    y = 1.0 + 0.2 * t + 0.7 * np.cos(2 * np.pi * t) + rng.normal(0, 0.05, 120)
    from yatsm_spark.kernel.fit import GlmnetLasso

    g = GlmnetLasso(alpha=0.0, max_iter=5000).fit(X, y).coef_
    o = OLS().fit(X, y).coef_
    np.testing.assert_allclose(g, o, atol=1e-5)
