"""Freshness pin for the committed kernel-twin goldens (tools/make_goldens.py).

If kernel/ccdc.py, kernel/classify.py, CONV_PARAMS, or the committed sf0.01
transcripts change, the stored golden parquets must be regenerated — the
driver's tx_segments / tx_classify oracle rows read them. This test
regenerates the twin in-process (pure numpy + DuckDB, no Spark) and
asserts bit-equality with what's on disk.
"""

import os
import sys

import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def test_goldens_are_fresh():
    from make_goldens import classify_twin, segments_twin

    segs = segments_twin("conv00000300")
    stored = pd.read_parquet(os.path.join(REPO, "data", "golden_segments_sf0.01.parquet"))
    pd.testing.assert_frame_equal(segs, stored, check_exact=True)

    cls = classify_twin(segs)
    stored_cls = pd.read_parquet(os.path.join(REPO, "data", "golden_classify_sf0.01.parquet"))
    pd.testing.assert_frame_equal(cls, stored_cls, check_exact=True)

    from make_goldens import crossval_twin

    cv = crossval_twin(segs)
    stored_cv = pd.read_parquet(os.path.join(REPO, "data", "golden_crossval_sf0.01.parquet"))
    pd.testing.assert_frame_equal(cv, stored_cv, check_exact=True)

    from make_goldens import segments_multi_twin

    multi = segments_multi_twin("conv00000100")
    stored_multi = pd.read_parquet(
        os.path.join(REPO, "data", "golden_segments_multi_sf0.01.parquet"))
    pd.testing.assert_frame_equal(multi, stored_multi, check_exact=True)

    from make_goldens import pheno_segments_twin, postprocess_twin

    post = postprocess_twin("conv00000200", crit=3.0)
    stored_post = pd.read_parquet(
        os.path.join(REPO, "data", "golden_postprocess_sf0.01.parquet"))
    pd.testing.assert_frame_equal(post, stored_post, check_exact=True)

    refit = postprocess_twin("conv00000200", crit=None)
    stored_refit = pd.read_parquet(
        os.path.join(REPO, "data", "golden_refit_sf0.01.parquet"))
    pd.testing.assert_frame_equal(refit, stored_refit, check_exact=True)

    pheno = pheno_segments_twin("conv00000200")
    stored_pheno = pd.read_parquet(
        os.path.join(REPO, "data", "golden_pheno_segments_sf0.01.parquet"))
    pd.testing.assert_frame_equal(pheno, stored_pheno, check_exact=True)

    from make_goldens import kmeans_twin

    km = kmeans_twin(n_centroids=8, n_iters=3, seed=0, sample_mod=1)
    stored_km = pd.read_parquet(
        os.path.join(REPO, "data", "golden_kmeans_sf0.01.parquet"))
    pd.testing.assert_frame_equal(km, stored_km, check_exact=True)

    from make_goldens import jpeg_twin

    jp = jpeg_twin()
    stored_jp = pd.read_parquet(
        os.path.join(REPO, "data", "golden_jpeg_sf0.01.parquet"))
    pd.testing.assert_frame_equal(jp, stored_jp, check_exact=True)

    from make_goldens import pca_twin

    pca = pca_twin(k=4)
    stored_pca = pd.read_parquet(
        os.path.join(REPO, "data", "golden_pca_sf0.01.parquet"))
    pd.testing.assert_frame_equal(pca, stored_pca, check_exact=True)

    from make_goldens import pq_twin

    pq_codes, pq_topk = pq_twin()
    stored_codes = pd.read_parquet(
        os.path.join(REPO, "data", "golden_pq_codes_sf0.01.parquet"))
    stored_codes["code"] = stored_codes["code"].map(list)
    pd.testing.assert_frame_equal(pq_codes, stored_codes, check_exact=True)
    stored_topk = pd.read_parquet(
        os.path.join(REPO, "data", "golden_pq_topk_sf0.01.parquet"))
    pd.testing.assert_frame_equal(pq_topk, stored_topk, check_exact=True)

    from make_goldens import ivfpq_twin

    ivfpq = ivfpq_twin()
    stored_ivfpq = pd.read_parquet(
        os.path.join(REPO, "data", "golden_ivfpq_sf0.01.parquet"))
    pd.testing.assert_frame_equal(ivfpq, stored_ivfpq, check_exact=True)

    from make_goldens import lttb_twin

    lt = lttb_twin()
    stored_lt = pd.read_parquet(
        os.path.join(REPO, "data", "golden_lttb_sf0.01.parquet"))
    pd.testing.assert_frame_equal(lt, stored_lt, check_exact=True)

    from make_goldens import matrix_profile_twin

    mp = matrix_profile_twin()
    stored_mp = pd.read_parquet(
        os.path.join(REPO, "data", "golden_mp_sf0.01.parquet"))
    pd.testing.assert_frame_equal(mp, stored_mp, check_exact=True)

    from make_goldens import pelt_twin

    pl = pelt_twin()
    stored_pl = pd.read_parquet(
        os.path.join(REPO, "data", "golden_pelt_sf0.01.parquet"))
    pd.testing.assert_frame_equal(pl, stored_pl, check_exact=True)

    from make_goldens import dtw_twin

    dt = dtw_twin()
    stored_dt = pd.read_parquet(
        os.path.join(REPO, "data", "golden_dtw_sf0.01.parquet"))
    pd.testing.assert_frame_equal(dt, stored_dt, check_exact=True)

    from make_goldens import bursts_twin

    bu = bursts_twin()
    stored_bu = pd.read_parquet(
        os.path.join(REPO, "data", "golden_bursts_sf0.01.parquet"))
    pd.testing.assert_frame_equal(bu, stored_bu, check_exact=True)

    from make_goldens import swing_twin

    sw = swing_twin()
    stored_sw = pd.read_parquet(
        os.path.join(REPO, "data", "golden_swing_sf0.01.parquet"))
    pd.testing.assert_frame_equal(sw, stored_sw, check_exact=True)

    from make_goldens import ab_twin

    ab = ab_twin()
    stored_ab = pd.read_parquet(
        os.path.join(REPO, "data", "golden_ab_sf0.01.parquet"))
    pd.testing.assert_frame_equal(ab, stored_ab, check_exact=True)

    from make_goldens import left_profile_twin

    lp = left_profile_twin()
    stored_lp = pd.read_parquet(
        os.path.join(REPO, "data", "golden_lp_sf0.01.parquet"))
    pd.testing.assert_frame_equal(lp, stored_lp, check_exact=True)


def test_kalman_golden_is_fresh():
    from make_goldens import kalman_twin

    ka = kalman_twin()
    stored = pd.read_parquet(
        os.path.join(REPO, "data", "golden_kalman_sf0.01.parquet"))
    pd.testing.assert_frame_equal(ka, stored, check_exact=True)
