"""Orphaned-asset selection for storage GC.

Mirrors ``core/storage/asset_cleanup.py``: an orphan is a raster/visual
object in the assets store that no live ``href`` references — e.g. a file
left behind when a re-derivation rewrote an asset's href in place.
Non-asset sidecars (``.json`` metadata) are never selected, so
legitimate files are safe.

Two shapes:
- ``select_orphan_objects`` — the reference's pure-list contract,
  byte-for-byte semantics, for bounded listings.
- ``orphan_objects_df`` — the 100-TB path: the bucket listing and the
  live-href catalog are both DataFrames; selection is one broadcast
  left-anti join + an extension filter, never a driver-side set. A store
  with billions of objects GCs in one distributed pass.
"""

from __future__ import annotations

import os
from typing import Iterable, Sequence

from pyspark.sql import DataFrame, functions as F

DELETABLE_EXTENSIONS = (".tif", ".tiff", ".png", ".webp", ".jpeg", ".jpg")


def select_orphan_objects(object_paths: Iterable[str],
                          live_hrefs: Iterable[str],
                          deletable_extensions: Sequence[str]
                          = DELETABLE_EXTENSIONS) -> list[str]:
    """Object paths safe to delete: deletable extension AND not referenced
    by any live href (asset_cleanup.py:28-45)."""
    live = set(live_hrefs)
    exts = tuple(e.lower() for e in deletable_extensions)
    return [p for p in object_paths
            if p not in live and os.path.splitext(p)[1].lower() in exts]


def orphan_objects_df(listing: DataFrame, live: DataFrame,
                      path_col: str = "path", href_col: str = "href",
                      deletable_extensions: Sequence[str]
                      = DELETABLE_EXTENSIONS) -> DataFrame:
    """Distributed orphan selection: ``listing`` (bucket keys) anti-joined
    against ``live`` (catalog hrefs). The live side is the bounded one
    (catalog rows ≪ bucket objects) and is broadcast, so the billion-key
    listing is never shuffled."""
    ext = F.lower(F.regexp_extract(F.col(path_col), r"(\.[^./\\]+)$", 1))
    deletable = listing.where(
        ext.isin([e.lower() for e in deletable_extensions]))
    live_paths = live.select(F.col(href_col).alias(path_col)).distinct()
    return deletable.join(F.broadcast(live_paths), path_col, "left_anti")
