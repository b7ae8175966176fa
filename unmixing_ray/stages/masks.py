"""Tile-level mask stages: thin map_batches wrappers over kernels/masks.

The standard cleaning chain of the reference's LSMA flow (SURVEY.md §3.1:
cfmask → saturation_mask → density_slice water mask → binary_mask) fused
into one vectorized batch function. Uniform-shape batches (the normal
case) are processed as ONE (n, p, h, w) cube with no per-tile Python
loop; ragged batches fall back to per-tile kernels.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..constants import NODATA
from ..kernels import masks as mk
from .decode import binary_column, binary_views, tiles_to_ndarray


def make_clean_stage(qa_values=(1, 2, 3, 4, 255), saturation=10000,
                     water_band=4, water_threshold=1000, nodata=NODATA,
                     apply_water=True):
    """Returns a map_batches fn replacing ``pixels`` with the masked
    payload (QA + saturation + optional density-slice water mask)."""
    qa_set = np.asarray(qa_values)

    def clean(batch: pa.Table) -> pa.Table:
        arrays, uniform = tiles_to_ndarray(batch)
        has_qa = "qa" in batch.column_names
        n = batch.num_rows
        if uniform is not None:
            cube = np.array(uniform, copy=True)        # (n, p, h, w)
            _, p, h, w = cube.shape
            if has_qa:
                qv, qoff = binary_views(batch["qa"], np.uint8)
                if len(qv) >= n * h * w:
                    qa_cube = qv[qoff[0]:qoff[-1]].reshape(n, h, w)
                    qa_mask = np.isin(qa_cube, qa_set)       # (n, h, w)
                    cube[np.broadcast_to(qa_mask[:, None], cube.shape)] \
                        = nodata
            sat = (cube > saturation).any(axis=1)            # (n, h, w)
            cube[np.broadcast_to(sat[:, None], cube.shape)] = nodata
            if apply_water:
                b = cube[:, water_band]
                water = (b <= water_threshold) & (b != nodata)
                cube[np.broadcast_to(water[:, None], cube.shape)] = nodata
            out16 = cube.astype(np.int16, copy=False)
            col = pa.array([out16[i].tobytes() for i in range(n)],
                           pa.binary())
        else:
            qa_col = batch["qa"] if has_qa else None
            if isinstance(qa_col, pa.ChunkedArray):
                qa_col = qa_col.combine_chunks()
            outs = []
            for i in range(n):
                a = np.array(arrays[i], copy=True)
                h, w = a.shape[1], a.shape[2]
                if qa_col is not None and qa_col[i].is_valid:
                    qa = np.frombuffer(qa_col[i].as_py(),
                                       dtype=np.uint8).reshape(h, w)
                    a = mk.binary_mask(a, mk.cfmask(qa, qa_values),
                                       nodata)
                a = mk.binary_mask(a, mk.saturation_mask(a, saturation),
                                   nodata)
                if apply_water:
                    water = mk.density_slice(
                        a[water_band:water_band + 1],
                        threshold=water_threshold, nodata=nodata)
                    a = mk.binary_mask(a, water, nodata)
                outs.append(a.astype(np.int16))
            col = binary_column(outs)
        i = batch.column_names.index("pixels")
        return batch.set_column(i, "pixels", col)

    return clean
