"""Numeric core of product quantization — shared verbatim by the Spark
operator (operators/pq.py) and its Spark-free twin
(tools/make_goldens.py::pq_twin). Every float fold is the
kernel.vecmath sequential-dimension discipline, so operator batches and
the twin produce bit-identical codebooks, codes, and ADC distances.
Argmin ties take the lowest code index (numpy first occurrence — the
IVF lowest-cid convention).
"""

from __future__ import annotations

import numpy as np

from yatsm_spark.kernel.vecmath import seq_sqdist


def pq_train_core(V: np.ndarray, m: int, ksub: int,
                  n_iters: int) -> np.ndarray:
    """(m, ksub, dsub) codebooks via per-subspace Lloyd's on the sample
    rows of V (already in id order). Init = first ksub subvectors;
    update = member mean accumulated in id order; empty clusters keep
    their previous centroid."""
    n, d = V.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m} subspaces")
    if n < ksub:
        raise ValueError(f"sample of {n} rows < ksub={ksub}")
    dsub = d // m
    books = np.empty((m, ksub, dsub), dtype=np.float64)
    for s in range(m):
        Vs = np.ascontiguousarray(V[:, s * dsub:(s + 1) * dsub],
                                  dtype=np.float64)
        C = Vs[:ksub].copy()
        for _ in range(n_iters):
            assign = np.argmin(seq_sqdist(Vs, C), axis=1)
            for j in range(ksub):
                members = np.nonzero(assign == j)[0]  # ascending order
                if len(members) == 0:
                    continue
                acc = np.zeros(dsub, dtype=np.float64)
                for i in members:
                    acc = acc + Vs[i]
                C[j] = acc / len(members)
        books[s] = C
    return books


def pq_encode_core(V: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, m) int32 codes: per-subspace argmin of seq-fold sq-L2."""
    m, ksub, dsub = books.shape
    codes = np.empty((V.shape[0], m), dtype=np.int32)
    for s in range(m):
        Vs = np.ascontiguousarray(V[:, s * dsub:(s + 1) * dsub],
                                  dtype=np.float64)
        codes[:, s] = np.argmin(seq_sqdist(Vs, books[s]), axis=1)
    return codes


def pq_lut(Q: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(nq, m, ksub) per-query lookup tables of subspace sq-L2 parts."""
    m, ksub, dsub = books.shape
    lut = np.empty((Q.shape[0], m, ksub), dtype=np.float64)
    for s in range(m):
        Qs = np.ascontiguousarray(Q[:, s * dsub:(s + 1) * dsub],
                                  dtype=np.float64)
        lut[:, s, :] = seq_sqdist(Qs, books[s])
    return lut


def pq_adc_core(codes: np.ndarray, lut_q: np.ndarray) -> np.ndarray:
    """ADC distances of one query against all code rows: m lookups
    accumulated in subspace order."""
    acc = np.zeros(codes.shape[0], dtype=np.float64)
    for s in range(lut_q.shape[0]):
        acc += lut_q[s, codes[:, s]]
    return acc
