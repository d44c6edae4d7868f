"""Pure numpy kernels — zero Spark imports.

These are the sequential/numeric cores that Spark cannot express relationally
(SURVEY.md §2.5 frame-spec note). Each module cites the reference anchor it
re-implements (semantics only, re-derived from the public CCDC literature —
the reference mount was empty at build time, see SURVEY.md §0).
"""

from yatsm_spark.kernel.design import harmonic_design
from yatsm_spark.kernel.diagnostics import rmse
from yatsm_spark.kernel.robust import bisquare, mad, rlm_fit
from yatsm_spark.kernel.recresid import recresid
from yatsm_spark.kernel.ccdc import CCDCParams, ccdc_fit

__all__ = [
    "harmonic_design",
    "rmse",
    "mad",
    "bisquare",
    "rlm_fit",
    "recresid",
    "CCDCParams",
    "ccdc_fit",
]
