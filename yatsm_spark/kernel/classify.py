"""P4: segment classification — pure-numpy random forest.

Parity anchor: `yatsm/cli/train.py::get_training_inputs` +
`yatsm/cli/classify.py` [M] (SURVEY.md §2.10) — the reference trains an
sklearn ensemble (RandomForest) on per-segment features against ROI labels
and writes per-segment `class` / `class_proba` fields. sklearn is not in
this container, so the estimator is a from-scratch numpy CART forest:
gini splits over sorted feature columns (vectorized cumulative class
counts), bootstrap rows + sqrt-feature subsampling per tree, majority
probability averaging. Deterministic under a fixed seed (np.random
Generator; no global state), which the engine requires for resumable /
re-runnable classification jobs.

A4 (`yatsm/classifiers/diagnostics.py` crossvalidation scores) is
`kfold_scores` below.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


# --- single CART tree (arrays, not objects) ---------------------------------


@dataclass
class _Tree:
    feature: np.ndarray      # int32, -1 = leaf
    thresh: np.ndarray       # float64
    left: np.ndarray         # int32 child ids
    right: np.ndarray
    proba: np.ndarray        # (n_nodes, n_classes) leaf class distribution


def _best_split(X: np.ndarray, y: np.ndarray, n_classes: int,
                feat_ids: np.ndarray, min_leaf: int):
    """Best (feature, threshold) by gini impurity decrease; vectorized per
    feature via cumulative class counts over the sorted column."""
    n = len(y)
    best = (None, None, 0.0)  # feature, thresh, gain
    counts_total = np.bincount(y, minlength=n_classes).astype(np.float64)
    gini_parent = 1.0 - ((counts_total / n) ** 2).sum()
    for f in feat_ids:
        order = np.argsort(X[:, f], kind="stable")
        xs = X[order, f]
        ys = y[order]
        onehot = np.zeros((n, n_classes))
        onehot[np.arange(n), ys] = 1.0
        cum = np.cumsum(onehot, axis=0)            # class counts left of i+1
        nl = np.arange(1, n, dtype=np.float64)     # split after row i
        valid = (xs[1:] != xs[:-1]) & (nl >= min_leaf) & ((n - nl) >= min_leaf)
        if not valid.any():
            continue
        cl = cum[:-1]
        cr = counts_total - cl
        gl = 1.0 - ((cl / nl[:, None]) ** 2).sum(axis=1)
        gr = 1.0 - ((cr / (n - nl)[:, None]) ** 2).sum(axis=1)
        gain = gini_parent - (nl * gl + (n - nl) * gr) / n
        gain[~valid] = -1.0
        k = int(np.argmax(gain))
        if gain[k] > best[2] + 1e-12:
            best = (int(f), (xs[k] + xs[k + 1]) / 2.0, float(gain[k]))
    return best


def _grow(X, y, n_classes, rng, max_depth, min_leaf, n_feat_sub):
    feature, thresh, left, right, proba = [], [], [], [], []

    def leaf(yy):
        feature.append(-1); thresh.append(0.0); left.append(-1); right.append(-1)
        p = np.bincount(yy, minlength=n_classes).astype(np.float64)
        proba.append(p / max(p.sum(), 1.0))
        return len(feature) - 1

    def node(idx, depth):
        yy = y[idx]
        if depth >= max_depth or len(idx) < 2 * min_leaf or len(np.unique(yy)) == 1:
            return leaf(yy)
        feats = rng.choice(X.shape[1], size=min(n_feat_sub, X.shape[1]), replace=False)
        f, t, gain = _best_split(X[idx], yy, n_classes, np.sort(feats), min_leaf)
        if f is None:
            return leaf(yy)
        me = len(feature)
        feature.append(f); thresh.append(t); left.append(-1); right.append(-1)
        proba.append(np.zeros(n_classes))
        mask = X[idx, f] <= t
        left[me] = node(idx[mask], depth + 1)
        right[me] = node(idx[~mask], depth + 1)
        return me

    root = node(np.arange(len(y)), 0)
    assert root == 0
    return _Tree(np.array(feature, dtype=np.int32), np.array(thresh),
                 np.array(left, dtype=np.int32), np.array(right, dtype=np.int32),
                 np.vstack(proba))


def _tree_proba(tree: _Tree, X: np.ndarray) -> np.ndarray:
    """Vectorized traversal: advance every sample one level per step."""
    node = np.zeros(len(X), dtype=np.int32)
    active = tree.feature[node] >= 0
    while active.any():
        f = tree.feature[node[active]]
        t = tree.thresh[node[active]]
        go_left = X[active, f] <= t
        nxt = np.where(go_left, tree.left[node[active]], tree.right[node[active]])
        node[active] = nxt
        active = tree.feature[node] >= 0
    return tree.proba[node]


# --- forest ------------------------------------------------------------------


@dataclass
class RandomForest:
    n_trees: int = 50
    max_depth: int = 10
    min_leaf: int = 2
    seed: int = 0
    classes_: np.ndarray | None = None
    trees: list = field(default_factory=list)

    def fit(self, X: np.ndarray, y) -> "RandomForest":
        X = np.asarray(X, dtype=np.float64)
        y = np.asarray(y)
        self.classes_, yi = np.unique(y, return_inverse=True)
        k = len(self.classes_)
        n_feat_sub = max(1, int(np.sqrt(X.shape[1])))
        rng = np.random.default_rng(self.seed)
        self.trees = []
        for _ in range(self.n_trees):
            boot = rng.integers(0, len(y), size=len(y))
            self.trees.append(
                _grow(X[boot], yi[boot], k, rng, self.max_depth,
                      self.min_leaf, n_feat_sub))
        return self

    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        X = np.asarray(X, dtype=np.float64)
        p = np.zeros((len(X), len(self.classes_)))
        for t in self.trees:
            p += _tree_proba(t, X)
        return p / len(self.trees)

    def predict(self, X: np.ndarray) -> np.ndarray:
        return self.classes_[np.argmax(self.predict_proba(X), axis=1)]


# --- A4: crossvalidation scores ----------------------------------------------


def kfold_scores(X, y, k: int = 5, seed: int = 0, **forest_kw) -> np.ndarray:
    """Per-fold held-out accuracy (the graft of the reference's
    crossvalidation diagnostics). Deterministic shuffle-split."""
    X = np.asarray(X, dtype=np.float64)
    y = np.asarray(y)
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(y))
    folds = np.array_split(order, k)
    scores = []
    for i in range(k):
        test = folds[i]
        train = np.concatenate([folds[j] for j in range(k) if j != i])
        m = RandomForest(seed=seed + 1000 + i, **forest_kw).fit(X[train], y[train])
        scores.append(float((m.predict(X[test]) == y[test]).mean()))
    return np.array(scores)
