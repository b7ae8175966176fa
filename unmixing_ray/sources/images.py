"""Input-table reader facade.

The north star names a Lance table of image+caption pairs; ``lance`` is not
installable in this environment, so the facade reads the schema-identical
parquet layout and will prefer ``ray.data.read_lance`` when a ``.lance``
dataset and the lance reader are available (SURVEY.md §7c).

Reference analogue: ``as_array``/``as_raster`` (utils.py:45-63,106-115)
open one file at a time; here the "open" is a distributed columnar read
with column pruning.
"""

from __future__ import annotations

import os

import ray.data


IMAGE_COLUMNS = [
    "image_id", "bytes", "w", "h", "fmt", "caption", "phash", "qa",
    "gt", "crs",
]


def read_images(corpus_dir, columns=None, **kwargs):
    """Read the images table as a Ray Dataset, pruning to ``columns``."""
    lance_path = os.path.join(corpus_dir, "images.lance")
    if os.path.exists(lance_path) and hasattr(ray.data, "read_lance"):
        try:
            return ray.data.read_lance(lance_path, columns=columns, **kwargs)
        except Exception:
            pass  # fall back to parquet
    sharded = os.path.join(corpus_dir, "images")
    path = sharded if os.path.isdir(sharded) else \
        os.path.join(corpus_dir, "images.parquet")
    return ray.data.read_parquet(path, columns=columns, **kwargs)


def read_polygons(corpus_dir, columns=None, **kwargs):
    path = os.path.join(corpus_dir, "polygons.parquet")
    return ray.data.read_parquet(path, columns=columns, **kwargs)
