"""Sequential-fold vector math shared by the broadcast-codebook IVF path
and its Spark-free numpy twins.

Bit-parity contract: Catalyst's ``F.aggregate`` evaluates a left fold in
array-index order — ``((0 + v0*c0) + v1*c1) + ...`` — one IEEE-754 double
add per element. These helpers reproduce that EXACT operation sequence in
numpy (vectorised across rows, sequential across dimensions), so a dot
product / norm computed here is bit-identical to the same quantity built
from ``F.zip_with`` + ``F.aggregate`` literals. ``np.dot``/``np.matmul``
would NOT satisfy this (BLAS uses blocked/pairwise summation), which is
why the obvious matmul is deliberately avoided.

Parity target: yatsm has no vector-similarity analogue (task-brief
training-data-pipeline family); the fold-order discipline mirrors
SURVEY.md §7.5.1's float policy.
"""

from __future__ import annotations

import numpy as np


def seq_dot(V: np.ndarray, C: np.ndarray) -> np.ndarray:
    """Ordered-fold dot products: V (n, d) × C (k, d) -> (n, k).

    acc_{i,j} = Σ_d V[i,d]·C[j,d] accumulated sequentially in dimension
    order — the same add sequence as Catalyst's per-row aggregate fold.
    """
    V = np.ascontiguousarray(V, dtype=np.float64)
    C = np.ascontiguousarray(C, dtype=np.float64)
    n, d = V.shape
    acc = np.zeros((n, C.shape[0]), dtype=np.float64)
    for dd in range(d):
        acc += V[:, dd : dd + 1] * C[:, dd][None, :]
    return acc


def seq_norm(V: np.ndarray) -> np.ndarray:
    """Ordered-fold L2 norms of the rows of V (n, d) -> (n,).

    sqrt(Σ_d v_d²) with the sum folded sequentially in dimension order —
    bit-identical to ``sqrt(aggregate(v, 0.0, (acc, x) -> acc + x*x))``.
    """
    V = np.ascontiguousarray(V, dtype=np.float64)
    acc = np.zeros(V.shape[0], dtype=np.float64)
    for dd in range(V.shape[1]):
        acc += V[:, dd] * V[:, dd]
    return np.sqrt(acc)


def cosine_sims_seqfold(V: np.ndarray, C: np.ndarray,
                        cnorms: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(sims, vnorms): rows-of-V × rows-of-C cosine matrix with every
    floating-point step in Catalyst fold order.

    sims[i, j] = seq_dot / (vnorm_i * cnorm_j) — multiply-then-divide,
    matching ``dot / (nrm * cn)`` in the literal-codebook expressions.
    ``cnorms`` is passed in (not recomputed) so the caller controls whether
    centroid norms came from Catalyst collect or from :func:`seq_norm` —
    either way the downstream arithmetic is identical.
    """
    vnorms = seq_norm(V)
    dots = seq_dot(V, C)
    return dots / (vnorms[:, None] * cnorms[None, :]), vnorms


def seq_sqdist(V: np.ndarray, C: np.ndarray) -> np.ndarray:
    """Ordered-fold squared L2 distances: V (n, d) × C (k, d) -> (n, k).

    acc_{i,j} = Σ_d (V[i,d] - C[j,d])² accumulated sequentially in
    dimension order — the PQ train/encode/ADC primitive. Same fold
    discipline as seq_dot: bit-identical wherever the same sequence of
    IEEE adds runs (operator's mapInPandas batches AND the Spark-free
    golden twin)."""
    V = np.ascontiguousarray(V, dtype=np.float64)
    C = np.ascontiguousarray(C, dtype=np.float64)
    acc = np.zeros((V.shape[0], C.shape[0]), dtype=np.float64)
    for dd in range(V.shape[1]):
        diff = V[:, dd][:, None] - C[:, dd][None, :]
        acc += diff * diff
    return acc
