"""Pure-numpy CART decision-tree classifier (sklearn stand-in).

The reference's SASMA uses ``sklearn.tree.DecisionTreeClassifier``
(sasma.py:23,74) to label candidate endmember pixels. scikit-learn is not
available in this environment, so this is a small, deterministic CART
implementation from the published algorithm (Breiman et al. 1984): binary
splits minimizing weighted Gini impurity, midpoint thresholds, features
scanned in index order with strict-improvement acceptance (deterministic
ties). The fitted tree serializes to plain numpy arrays so it can be
broadcast into actor pools.
"""

from __future__ import annotations

import numpy as np


class DecisionTree:
    def __init__(self, max_depth=12, min_samples_split=2,
                 min_samples_leaf=1):
        self.max_depth = max_depth
        self.min_samples_split = min_samples_split
        self.min_samples_leaf = min_samples_leaf
        # flat arrays: children_left/right (-1 = leaf), feature, threshold,
        # leaf class
        self._nodes = []

    @staticmethod
    def _gini(counts):
        n = counts.sum()
        if n == 0:
            return 0.0
        p = counts / n
        return 1.0 - (p * p).sum()

    def _best_split(self, X, y, classes):
        n, d = X.shape
        base_counts = np.array([(y == c).sum() for c in classes],
                               dtype=np.float64)
        best = (None, None, self._gini(base_counts))
        for f in range(d):
            order = np.argsort(X[:, f], kind="stable")
            xs = X[order, f]
            ys = y[order]
            left = np.zeros(len(classes))
            right = base_counts.copy()
            cls_idx = np.searchsorted(classes, ys)
            for i in range(n - 1):
                left[cls_idx[i]] += 1
                right[cls_idx[i]] -= 1
                if xs[i] == xs[i + 1]:
                    continue
                nl, nr = i + 1, n - i - 1
                if nl < self.min_samples_leaf or nr < self.min_samples_leaf:
                    continue
                score = (nl * self._gini(left)
                         + nr * self._gini(right)) / n
                if score < best[2] - 1e-12:
                    best = (f, (xs[i] + xs[i + 1]) / 2.0, score)
        return best

    def _grow(self, X, y, classes, depth):
        counts = np.array([(y == c).sum() for c in classes])
        node_id = len(self._nodes)
        # majority class, lowest label on tie (argmax lowest index)
        leaf_class = classes[int(np.argmax(counts))]
        self._nodes.append(
            {"left": -1, "right": -1, "feature": -1, "threshold": 0.0,
             "value": leaf_class})
        if depth >= self.max_depth or len(y) < self.min_samples_split \
                or (counts > 0).sum() <= 1:
            return node_id
        f, thr, _ = self._best_split(X, y, classes)
        if f is None:
            return node_id
        mask = X[:, f] <= thr
        if mask.all() or not mask.any():
            return node_id
        self._nodes[node_id]["feature"] = f
        self._nodes[node_id]["threshold"] = thr
        self._nodes[node_id]["left"] = self._grow(
            X[mask], y[mask], classes, depth + 1)
        self._nodes[node_id]["right"] = self._grow(
            X[~mask], y[~mask], classes, depth + 1)
        return node_id

    def fit(self, X, y):
        X = np.asarray(X, dtype=np.float64)
        y = np.asarray(y)
        self.classes_ = np.unique(y)
        self._nodes = []
        self._grow(X, y, self.classes_, 0)
        # pack to arrays for fast vectorized predict + cheap broadcast
        n = len(self._nodes)
        self.left = np.array([nd["left"] for nd in self._nodes])
        self.right = np.array([nd["right"] for nd in self._nodes])
        self.feature = np.array([nd["feature"] for nd in self._nodes])
        self.threshold = np.array([nd["threshold"] for nd in self._nodes])
        self.value = np.array([nd["value"] for nd in self._nodes])
        return self

    def predict(self, X):
        X = np.asarray(X, dtype=np.float64)
        n = X.shape[0]
        node = np.zeros(n, dtype=np.int64)
        active = self.feature[node] >= 0
        while active.any():
            f = self.feature[node[active]]
            thr = self.threshold[node[active]]
            go_left = X[active, f] <= thr
            nxt = np.where(go_left, self.left[node[active]],
                           self.right[node[active]])
            node[active] = nxt
            active = self.feature[node] >= 0
        return self.value[node]

    def to_arrays(self):
        return {"left": self.left, "right": self.right,
                "feature": self.feature, "threshold": self.threshold,
                "value": self.value, "classes": self.classes_}

    @classmethod
    def from_arrays(cls, arrs):
        t = cls()
        t.left = np.asarray(arrs["left"])
        t.right = np.asarray(arrs["right"])
        t.feature = np.asarray(arrs["feature"])
        t.threshold = np.asarray(arrs["threshold"])
        t.value = np.asarray(arrs["value"])
        t.classes_ = np.asarray(arrs["classes"])
        return t


class CARTLearner:
    """SASMA CART learner over raster arrays.

    Mirrors reference sasma.py:26-93: the combined NoData mask across the
    label raster and every feature raster selects training pixels; predict
    labels every pixel from the feature stack.
    """

    def __init__(self, y_raster, *x_rasters, nodata=-9999):
        self.nodata = nodata
        self.y_raster = np.asarray(y_raster)
        self.x_rasters = [np.asarray(x) for x in x_rasters]
        shp = self.y_raster.shape[1:]
        self.n_features = len(x_rasters)
        self.x_features_array = np.concatenate(
            self.x_rasters, axis=0).reshape((self.n_features,
                                             shp[0] * shp[1]))

    def fit_tree(self, params=None):
        params = params or {}
        shp = self.y_raster.shape[1:]
        combined = np.where(self.y_raster == self.nodata, 0, 1)
        for x in self.x_rasters:
            combined = combined * np.where(x == self.nodata, 0, 1)
        combined = combined.reshape((1, shp[0] * shp[1]))
        xm = np.where(combined.repeat(self.n_features, axis=0) == 0,
                      self.nodata, self.x_features_array)
        ym = np.where(combined[0] == 0, self.nodata,
                      self.y_raster.reshape((shp[0] * shp[1],)))
        X = xm[:, xm[0, :] != self.nodata].T
        y = ym[ym != self.nodata]
        if X.shape[0] != y.shape[0]:
            raise ValueError("labels and features misaligned after "
                             "NoData filtering")
        self.last_fit = DecisionTree(**params).fit(X, y)
        return (self.last_fit, X, y)

    def predict(self, fit=None, features=None):
        if fit is None:
            fit = self.last_fit
        if features is None:
            features = self.x_features_array
        return fit.predict(features.T).reshape(self.y_raster.shape)
