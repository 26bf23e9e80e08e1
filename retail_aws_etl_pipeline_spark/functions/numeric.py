"""Currency / quantity normalization as native Column expressions.

Same semantics as the reference's cleaners
(glue_job_raw_to_processed.py:279-287, re-applied defensively at
incremental_auto_compaction.py:205-207):

- ``clean_currency``: keep only ``[0-9().-]``, map accounting negatives
  ``(x)`` → ``-x``, cast double. ``"$1,413.15"`` → 1413.15, ``"(5.00)"`` →
  -5.00, ``"N/A"``/empty → NULL.
- ``clean_quantity``: keep only ``[0-9-]``, cast int (gold re-casts long).

Pure Catalyst expressions — three regexp_replace + a cast, whole-stage
codegen, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_col(source: Column | str) -> Column:
    return F.col(source) if isinstance(source, str) else source


def clean_currency(source: Column | str) -> Column:
    c = _as_col(source)
    c = F.regexp_replace(c.cast("string"), r"[^0-9()\.-]", "")
    c = F.regexp_replace(c, r"[(]", "-")
    c = F.regexp_replace(c, r"[)]", "")
    # try_cast: malformed ('' / '-' / '--') → NULL. Spark 4 ANSI mode makes
    # plain cast THROW on these; the reference ran non-ANSI Spark where cast
    # nulled silently — try_cast restores that semantic explicitly.
    return c.try_cast("double")


def clean_quantity(source: Column | str, target_type: str = "int") -> Column:
    c = _as_col(source)
    return F.regexp_replace(c.cast("string"), "[^0-9-]", "").try_cast(target_type)
