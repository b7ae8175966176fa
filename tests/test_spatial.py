"""STRtree / PIP / kNN primitives vs brute force."""

import numpy as np

from unmixing_ray.spatial import (STRtree, knn_centroids,
                                  point_ring_distance, points_in_ring)


def test_strtree_matches_bruteforce():
    rng = np.random.default_rng(31)
    n = 300
    x0 = rng.uniform(0, 100, n)
    y0 = rng.uniform(0, 100, n)
    boxes = np.stack([x0, y0, x0 + rng.uniform(1, 10, n),
                      y0 + rng.uniform(1, 10, n)], axis=1)
    tree = STRtree(boxes)
    for _ in range(50):
        px, py = rng.uniform(-5, 110, 2)
        got = tree.query_point(px, py)
        want = np.nonzero((boxes[:, 0] <= px) & (boxes[:, 2] >= px)
                          & (boxes[:, 1] <= py) & (boxes[:, 3] >= py))[0]
        assert np.array_equal(got, want)


def test_strtree_empty_and_single():
    assert len(STRtree(np.empty((0, 4))).query_point(0, 0)) == 0
    t = STRtree(np.array([[0.0, 0.0, 1.0, 1.0]]))
    assert t.query_point(0.5, 0.5).tolist() == [0]
    assert t.query_point(2.0, 2.0).tolist() == []


def test_points_in_ring_rect_and_convex():
    rect = [(0, 0), (10, 0), (10, 5), (0, 5), (0, 0)]
    xs = np.array([5.0, 11.0, 0.5, -1.0])
    ys = np.array([2.5, 2.5, 4.9, 2.0])
    assert points_in_ring(xs, ys, rect).tolist() == [True, False, True,
                                                     False]
    tri = [(0, 0), (10, 0), (5, 10)]
    assert points_in_ring(np.array([5.0]), np.array([3.0]), tri)[0]
    assert not points_in_ring(np.array([1.0]), np.array([9.0]), tri)[0]


def test_point_ring_distance():
    rect = [(0, 0), (10, 0), (10, 5), (0, 5)]
    assert point_ring_distance(5, 2, rect) == 0.0
    assert point_ring_distance(12, 2.5, rect) == 2.0
    assert abs(point_ring_distance(13, 9, rect)
               - np.hypot(3, 4)) < 1e-12


def test_knn_deterministic_ties():
    cx = np.array([0.0, 1.0, -1.0, 2.0])
    cy = np.zeros(4)
    ids = np.array(["d", "b", "c", "a"])
    idx, dist = knn_centroids(np.array([0.0]), np.array([0.0]),
                              cx, cy, k=3, tie_ids=ids)
    # nearest is index 0 (d, dist 0); then tie at dist 1 between b and c ->
    # id order picks b before c
    assert idx[0].tolist() == [0, 1, 2]
    assert dist[0].tolist() == [0.0, 1.0, 1.0]
    # k > n clips
    idx2, _ = knn_centroids(np.array([0.0]), np.array([0.0]),
                            cx, cy, k=10, tie_ids=ids)
    assert idx2.shape == (1, 4)
