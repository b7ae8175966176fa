"""region_props pinned against a brute-force full-image flood fill on
random multi-tile masks — components spanning many tiles must merge
their spatial partials exactly across the border exchange."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from tests.test_focal import _tiles_table
from unmixing_ray.stages.label import region_props


def _flood_props(mask):
    """Independent per-pixel BFS flood fill + property aggregation."""
    H, W = mask.shape
    seen = np.zeros_like(mask, dtype=bool)
    best = None
    for si in range(H):
        for sj in range(W):
            if not mask[si, sj] or seen[si, sj]:
                continue
            stack = [(si, sj)]
            seen[si, sj] = True
            px = []
            while stack:
                i, j = stack.pop()
                px.append((i, j))
                for di, dj in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                    ni, nj = i + di, j + dj
                    if 0 <= ni < H and 0 <= nj < W and mask[ni, nj] \
                            and not seen[ni, nj]:
                        seen[ni, nj] = True
                        stack.append((ni, nj))
            rr = np.array([p[0] for p in px])
            cc = np.array([p[1] for p in px])
            key = (len(px), int(rr.sum()), int(cc.sum()),
                   int(rr.min()), int(cc.min()),
                   int(rr.max()), int(cc.max()))
            if best is None or key > best:
                best = key
    return best


@pytest.mark.parametrize("seed,shape,thresh_p", [
    (4, (16, 24), 0.55), (5, (24, 24), 0.4), (6, (8, 8), 0.75)])
def test_region_props_matches_flood_fill(ray_session, seed, shape,
                                         thresh_p):
    rng = np.random.default_rng(seed)
    H, W = shape
    images = {}
    for n in range(3):
        # values above/below 1300 with probability thresh_p
        v = np.where(rng.random((H, W)) < thresh_p, 2000, 500)
        images["im%d_%d" % (seed, n)] = \
            v[None].astype(np.int16)
    tiles = ray.data.from_arrow(_tiles_table(images, 8)).repartition(4)
    got = region_props(tiles, threshold=1300).to_pandas()\
        .set_index("image_id")
    for img, arr in images.items():
        want = _flood_props(arr[0] > 1300)
        if want is None:
            assert img not in got.index
            continue
        r = got.loc[img]
        assert (int(r["px"]), int(r["sr"]), int(r["sc"]),
                int(r["r0"]), int(r["c0"]),
                int(r["r1"]), int(r["c1"])) == want, img
