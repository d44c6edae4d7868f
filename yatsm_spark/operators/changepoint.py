"""Offline optimal changepoint detection over a rollup tier: PELT
(kernel/pelt.py) driven through applyInPandas. Complements the greedy
online paths — kernel/ccdc.py's monitor (arrival-order break tests) and
streaming/stream_rollup.py's online_monitor — with the globally optimal
penalized segmentation of the full series.

Meaningful on the DENSE tier (row positions = time). One shuffle on the
series key; O(n^2)-worst-case kernel bounded by ``max_n`` — downsample
(lttb / m4 / cascade) before segmenting longer series.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def burst_intervals(turns: DataFrame, s: float = 3.0,
                    gamma: float = 1.0, by: str = "conv_id",
                    ts_col: str = "ts",
                    max_n: int = 100_000) -> DataFrame:
    """Kleinberg two-state burst detection per conversation over RAW
    turn arrival times (kernel/bursts.py) — no tier, no binning. Long
    form: one row per burst with its rank, bounds (epoch micros AND
    timestamps), and event count. Series with no bursts emit nothing.
    One shuffle on the conv key; O(n) kernel per conv."""
    import numpy as np
    import pandas as pd

    from yatsm_spark.kernel.bursts import kleinberg_bursts

    src = turns.select(by, ts_col)

    def fit(pdf):
        n = len(pdf)
        if n > max_n:
            raise ValueError(
                f"burst_intervals: conv of {n} turns exceeds "
                f"max_n={max_n}")
        t_us = pdf[ts_col].to_numpy(dtype="datetime64[us]") \
            .astype(np.int64)
        bursts = kleinberg_bursts(t_us, s, gamma)
        if not bursts:
            return pd.DataFrame(columns=[by, "burst_ord", "start_us",
                                         "end_us", "burst_start",
                                         "burst_end", "n_events"])
        return pd.DataFrame({
            by: pdf.iloc[0, 0],
            "burst_ord": np.arange(1, len(bursts) + 1, dtype=np.int64),
            "start_us": [b[0] for b in bursts],
            "end_us": [b[1] for b in bursts],
            "burst_start": [pd.Timestamp(b[0], unit="us")
                            for b in bursts],
            "burst_end": [pd.Timestamp(b[1], unit="us")
                          for b in bursts],
            "n_events": [b[2] for b in bursts],
        })

    schema = (f"{by} {dict(src.dtypes)[by]}, burst_ord long, "
              "start_us long, end_us long, burst_start timestamp, "
              "burst_end timestamp, n_events long")
    return src.groupBy(by).applyInPandas(fit, schema)


def pelt_changepoints(tier: DataFrame, value_col: str = "turn_count",
                      penalty: float | None = None, min_size: int = 2,
                      by: str = "conv_id",
                      order_col: str = "window_start",
                      max_n: int = 8192) -> DataFrame:
    """Long form: one row per detected changepoint with its 1-based
    rank, row index, the slot where the new segment starts, and the
    series' total changepoint count. Series with no changepoints emit
    nothing. ``penalty=None`` uses the kernel's per-series
    2*Var(x)*ln(n) default."""
    import numpy as np
    import pandas as pd

    from yatsm_spark.kernel.pelt import pelt_core

    src = tier.select(by, order_col, value_col)

    def fit(pdf):
        pdf = (pdf.sort_values(order_col, kind="mergesort")
                  .reset_index(drop=True))
        n = len(pdf)
        if n > max_n:
            raise ValueError(
                f"pelt_changepoints: series of {n} rows exceeds "
                f"max_n={max_n}; downsample (lttb/m4/cascade) first")
        cps = pelt_core(pdf[value_col].to_numpy(dtype=np.int64),
                        penalty, min_size)
        if cps.size == 0:
            return pd.DataFrame(columns=[by, "cp_ord", "idx",
                                         order_col, "n_changepoints"])
        return pd.DataFrame({
            by: pdf.iloc[0, 0],
            "cp_ord": np.arange(1, cps.size + 1, dtype=np.int64),
            "idx": cps,
            order_col: pdf[order_col].iloc[cps].to_numpy(),
            "n_changepoints": np.int64(cps.size),
        })

    schema = (f"{by} {dict(src.dtypes)[by]}, cp_ord long, idx long, "
              f"{order_col} {dict(src.dtypes)[order_col]}, "
              "n_changepoints long")
    return src.groupBy(by).applyInPandas(fit, schema)
