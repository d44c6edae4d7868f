"""P4 classification + A4 crossvalidation: numpy forest round-trip through
the Spark train/predict operators (graft of yatsm train/classify CLIs)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import Row, functions as F


def _synthetic_segments(n_convs=120, segs_per_conv=3, seed=0):
    """Two behavioural classes with separable segment features:
    'bursty' convs: high magnitude/rmse, short segments;
    'calm'  convs: low magnitude/rmse, long segments."""
    rng = np.random.default_rng(seed)
    rows, labels = [], []
    for i in range(n_convs):
        cls = "bursty" if i % 2 == 0 else "calm"
        labels.append(Row(conv_id=f"c{i:04d}", label=cls))
        for s in range(segs_per_conv):
            if cls == "bursty":
                mag, rmse, nobs = rng.normal(8, 1.5), rng.normal(5, 1), rng.integers(20, 120)
            else:
                mag, rmse, nobs = rng.normal(1, 0.5), rng.normal(1.2, 0.3), rng.integers(300, 2000)
            rows.append(Row(
                conv_id=f"c{i:04d}", segment_id=s,
                coef=[float(rng.normal(2, 1)), float(mag / 4), 0.1, -0.05],
                rmse=float(abs(rmse)), magnitude=float(mag), n_obs=int(nobs),
            ))
    return rows, labels


def test_train_predict_roundtrip_heldout_accuracy(spark):
    from yatsm_spark.operators.classify import (
        classify_segments,
        segment_features,
        train_segment_classifier,
    )

    rows, labels = _synthetic_segments()
    segs = spark.createDataFrame(rows)
    # train on the first 80 convs, hold out the remaining 40
    train_labels = spark.createDataFrame(labels[:80])
    heldout = {r.conv_id: r.label for r in labels[80:]}

    feats = segment_features(segs)
    model = train_segment_classifier(feats, train_labels, n_trees=25, seed=3)
    pred = classify_segments(segs, model).toPandas()

    assert {"class", "class_proba"} <= set(pred.columns)
    assert ((pred["class_proba"] > 0.33) & (pred["class_proba"] <= 1.0)).all()
    ho = pred[pred["conv_id"].isin(heldout)]
    acc = (ho["class"] == ho["conv_id"].map(heldout)).mean()
    assert acc >= 0.9, acc


def test_predictions_deterministic(spark):
    from yatsm_spark.operators.classify import (
        classify_segments,
        segment_features,
        train_segment_classifier,
    )

    rows, labels = _synthetic_segments(n_convs=40)
    segs = spark.createDataFrame(rows)
    lab = spark.createDataFrame(labels)
    feats = segment_features(segs)
    out = []
    for _ in range(2):
        m = train_segment_classifier(feats, lab, n_trees=10, seed=7)
        p = classify_segments(segs, m).orderBy("conv_id", "segment_id").toPandas()
        out.append(p)
    pd.testing.assert_frame_equal(out[0], out[1])


def test_crossval_report(spark):
    from yatsm_spark.operators.classify import crossval_report, segment_features

    rows, labels = _synthetic_segments(n_convs=80)
    segs = spark.createDataFrame(rows)
    rep = crossval_report(segment_features(segs), spark.createDataFrame(labels),
                          k=4, n_trees=15, seed=1)
    assert list(rep["fold"]) == [0, 1, 2, 3]
    assert (rep["accuracy"] >= 0.85).all(), rep


def test_max_train_guard(spark):
    from yatsm_spark.operators.classify import (
        segment_features,
        train_segment_classifier,
    )

    rows, labels = _synthetic_segments(n_convs=20)
    segs = spark.createDataFrame(rows)
    lab = spark.createDataFrame(labels)
    with pytest.raises(ValueError, match="max_train"):
        train_segment_classifier(segment_features(segs), lab, max_train=10)
