"""Table IO helpers: column-pruned parquet reads, gated Lance support.

Prune at the read (``columns=[...]``) so only needed columns leave storage
— SURVEY.md's "a read that loads all columns for a 2-column transform is
wrong". Lance is the design-point table format for the crawl tables
(BASELINE.json input_hint); this sandbox ships pyarrow/parquet only, so
``read_table`` falls back transparently.
"""

from __future__ import annotations

import os

__all__ = ["read_table", "write_table", "HAVE_LANCE"]

try:  # pragma: no cover - lance not present in this sandbox
    import lance  # noqa: F401

    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False


def read_table(sf_dir: str, name: str, columns: list[str] | None = None):
    """ray.data.Dataset for ``{sf_dir}/{name}.parquet`` (or ``.lance``)."""
    import ray.data as rd

    lance_path = os.path.join(sf_dir, f"{name}.lance")
    if HAVE_LANCE and os.path.exists(lance_path):  # pragma: no cover
        return rd.read_lance(lance_path, columns=columns)
    return rd.read_parquet(os.path.join(sf_dir, f"{name}.parquet"), columns=columns)


def write_table(ds, path: str):
    """Partitioned parquet (or Lance when available) under ``path``."""
    if HAVE_LANCE:  # pragma: no cover
        ds.write_lance(path)
    else:
        ds.write_parquet(path)
