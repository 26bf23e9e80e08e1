"""Cache-lifecycle contract for operators that persist intermediates.

Several operators persist an intermediate frame that the RETURNED plan
still references (a pagerank edge list re-entering the plan once per
iteration, a triangle census's oriented adjacency feeding wedge/closure/
count branches).  Those caches cannot be unpersisted inside the operator
— the caller hasn't executed the returned frame yet, and unpersisting
early would recompute the expensive upstream once per consumer, exactly
what the persist exists to prevent.  So the lifecycle is caller-owned,
and this module makes the handoff explicit instead of leaking blocks in
long-lived sessions (ADVICE r7: clustering.py persist audit):

- the operator tags its returned frame with :func:`retaining`;
- the caller, after its terminal action over the result, calls
  :func:`release_caches` on the SAME object the operator returned
  (derived frames from ``.select``/``.filter`` are new objects and do
  not carry the tag).

A caller that never releases is no worse than before — Spark's LRU
block manager still evicts under pressure — but one-shot pipelines
(tests, bench, the driver) now have a precise point to free executor
storage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_ATTR = "_retained_caches"


def retaining(result: DataFrame, *frames: DataFrame) -> DataFrame:
    """Tag ``result`` with the persisted ``frames`` its plan depends on."""
    existing = list(getattr(result, _ATTR, ()))
    setattr(result, _ATTR, existing + [f for f in frames if f is not None])
    return result


def retained_caches(result: DataFrame) -> list[DataFrame]:
    """The persisted frames tagged on ``result`` (empty if none)."""
    return list(getattr(result, _ATTR, ()))


def release_caches(result: DataFrame, blocking: bool = False) -> int:
    """Unpersist every frame tagged on ``result``; returns how many.

    Call after the terminal action over ``result`` — its plan will still
    compute correctly afterwards (unpersist only drops cached blocks),
    but re-executing it would redo the upstream work, so release last.
    """
    frames = retained_caches(result)
    for f in frames:
        f.unpersist(blocking)
    if frames:
        setattr(result, _ATTR, [])
    return len(frames)
