"""Plugin loading by import path — X1/X2/X3 (SURVEY §2.11).

The reference wires its processor pipeline, frontier, prioritizer and
sink classes from settings strings via ``custom_import``
(src/spyder/import_util.py); stages are called per-record as
``proc(curi)``. Here a stage is a DataFrame transform:

    stage(df: DataFrame, cfg: CrawlConfig) -> DataFrame

configured as ``"package.module:callable"`` (or dotted attribute path)
in ``CrawlConfig.extractor_pipeline``. The superstep applies stages in
order to the extracted fetch batch, before link discovery.
"""

from __future__ import annotations

import importlib
from typing import Callable

from pyspark.sql import DataFrame


def import_object(path: str):
    """Load ``pkg.mod:attr`` (preferred) or ``pkg.mod.attr``."""
    if ":" in path:
        mod_name, _, attr = path.partition(":")
        return getattr(importlib.import_module(mod_name), attr)
    mod_name, _, attr = path.rpartition(".")
    if not mod_name:
        raise ImportError(f"not an import path: {path!r}")
    return getattr(importlib.import_module(mod_name), attr)


def load_pipeline(paths: tuple[str, ...]) -> list[Callable[[DataFrame, object], DataFrame]]:
    return [import_object(p) for p in paths]


def apply_pipeline(df: DataFrame, cfg, paths: tuple[str, ...]) -> DataFrame:
    for stage in load_pipeline(paths):
        df = stage(df, cfg)
    return df
