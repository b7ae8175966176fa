"""Tile-level mask stages: thin map_batches wrappers over kernels/masks.

The standard cleaning chain of the reference's LSMA flow (SURVEY.md §3.1:
cfmask → saturation_mask → density_slice water mask → binary_mask) fused
into one vectorized batch function so each tile's payload is touched once.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..constants import NODATA
from ..kernels import masks as mk
from .decode import tiles_to_ndarray


def make_clean_stage(qa_values=(1, 2, 3, 4, 255), saturation=10000,
                     water_band=4, water_threshold=1000, nodata=NODATA,
                     apply_water=True):
    """Returns a map_batches fn replacing ``pixels`` with the masked
    payload (QA + saturation + optional density-slice water mask)."""

    def clean(batch: pa.Table) -> pa.Table:
        arrays, uniform = tiles_to_ndarray(batch)
        qa_col = batch["qa"] if "qa" in batch.column_names else None
        if isinstance(qa_col, pa.ChunkedArray):
            qa_col = qa_col.combine_chunks()
        n = batch.num_rows
        outs = []
        for i in range(n):
            a = uniform[i] if uniform is not None else arrays[i]
            a = np.array(a, copy=True)
            h, w = a.shape[1], a.shape[2]
            if qa_col is not None and qa_col[i].is_valid:
                qa = np.frombuffer(qa_col[i].as_py(),
                                   dtype=np.uint8).reshape(h, w)
                a = mk.binary_mask(a, mk.cfmask(qa, qa_values), nodata)
            a = mk.binary_mask(a, mk.saturation_mask(a, saturation), nodata)
            if apply_water:
                water = mk.density_slice(
                    a[water_band:water_band + 1],
                    threshold=water_threshold, nodata=nodata)
                a = mk.binary_mask(a, water, nodata)
            outs.append(a.astype(np.int16))
        from .decode import binary_column
        col = binary_column(outs)
        i = batch.column_names.index("pixels")
        return batch.set_column(i, "pixels", col)

    return clean
