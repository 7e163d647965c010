"""Shared dict-recode column idiom (SURVEY §2.2 P7).

The reference recodes labels with pandas ``.replace({col: dict})``
(e.g. jobs/csr_etl.py:126-127, jobs/fix_data.py:265-276,
jobs/staging_to_app.py:804-809): values present in the mapping are
replaced, everything else passes through. One literal-map lookup
with a pass-through coalesce -- used by every pipeline that recodes
sites/categories so the rule lives in one place.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def recode(col: Column | str, mapping: dict[str, str]) -> Column:
    """Map values through a literal dict, keeping unmapped values."""
    c = F.col(col) if isinstance(col, str) else col
    if not mapping:
        return c
    m = F.create_map(*[F.lit(x) for kv in mapping.items() for x in kv])
    return F.coalesce(m[c], c)
