"""Zoned lake layout + file lifecycle on any Hadoop-compatible filesystem.

Replaces the reference's S3 zone conventions and boto3 copy+delete moves
(docs/s3_layout.md, lambda_validator.py:98-101, glue_job_raw_to_processed.py:64-88,
398-407) with a filesystem-agnostic layout object and atomic renames.

Atomicity fix for the reference's broken K7 rollback
(glue_job_raw_to_processed.py:421-443, SURVEY.md §2.1): writes stage into a
temp directory next to the target and promote via rename, so a failed
ingest never leaves partial partitions behind. On local/HDFS rename is
atomic; on object stores a manifest-commit protocol would replace this —
the staging seam is where it plugs in.
"""

from __future__ import annotations

import os
import shutil
import uuid
from dataclasses import dataclass
from datetime import datetime, timezone


@dataclass(frozen=True)
class LakeLayout:
    """Directory layout mirroring docs/s3_layout.md:3-49."""

    root: str

    @property
    def raw(self) -> str:
        return os.path.join(self.root, "raw")

    @property
    def validated(self) -> str:
        return os.path.join(self.root, "validated")

    @property
    def processed(self) -> str:
        return os.path.join(self.root, "processed")

    @property
    def gold(self) -> str:
        return os.path.join(self.root, "gold", "fact_sales")

    def rejected(self, kind: str) -> str:
        # kind ∈ {system, structural, data_quality/json, data_quality/csv}
        return os.path.join(self.root, "rejected", kind)

    @property
    def audit(self) -> str:
        return os.path.join(self.root, "audit", "gold_compaction")

    def archive(self, zone: str) -> str:
        return os.path.join(self.root, "archive", zone)


def lineage_name(source_file: str, ingest_run_id: str, now: datetime | None = None) -> str:
    """``<file>_<YYYYMMDDTHHMMSS>_<ingest_run_id>`` archive naming
    (glue_job_raw_to_processed.py:398-400, README.md:74)."""
    ts = (now or datetime.now(timezone.utc)).strftime("%Y%m%dT%H%M%S")
    return f"{source_file}_{ts}_{ingest_run_id}"


def move_file(src: str, dst_dir: str, dst_name: str | None = None) -> str:
    """Atomic move (rename) of one file into a zone directory."""
    os.makedirs(dst_dir, exist_ok=True)
    dst = os.path.join(dst_dir, dst_name or os.path.basename(src))
    os.replace(src, dst)
    return dst


def new_run_id() -> str:
    return uuid.uuid4().hex[:12]


class StagedWrite:
    """Stage-then-rename commit for a directory write.

    Usage::

        with StagedWrite(final_dir) as stage:
            df.write.parquet(stage.path)   # or any directory-producing write
        # on clean exit the staged dir is promoted to final_dir atomically;
        # on exception it is removed and final_dir is untouched.
    """

    def __init__(self, final_dir: str):
        self.final = final_dir
        parent = os.path.dirname(final_dir.rstrip("/")) or "."
        os.makedirs(parent, exist_ok=True)
        self.path = os.path.join(parent, f".staging-{os.path.basename(final_dir)}-{uuid.uuid4().hex[:8]}")

    def __enter__(self) -> "StagedWrite":
        return self

    def __exit__(self, exc_type, exc, tb) -> bool:
        if exc_type is not None:
            shutil.rmtree(self.path, ignore_errors=True)
            return False
        if os.path.exists(self.final):
            shutil.rmtree(self.final)
        os.replace(self.path, self.final)
        return False
