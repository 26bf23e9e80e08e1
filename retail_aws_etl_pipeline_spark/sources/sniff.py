"""Delimiter sniffing on a small sample (driver-side, cheap by design).

Same strategy as the reference (glue_job_raw_to_processed.py:113-131,
lambda_validator.py:77-95): ``csv.Sniffer`` over a sample, fall back to
highest raw count of the candidate delimiters, final fallback ``,``.

Fixes the reference's S5 bug (SURVEY.md §2.1): there ``counts`` was only
defined in the fallback branch, so any file where Sniffer *succeeded* hit a
NameError and the whole file landed in rejected/system. Here ``counts`` is
always computed.

This is intentionally a driver-side pure-Python step: it reads ≤20 lines /
64 KB regardless of file size, so it costs the same at 100 TB as at 1 MB,
and it must run BEFORE the Spark plan exists because the projection is
data-dependent (SURVEY.md §3.1).
"""

from __future__ import annotations

import csv

CANDIDATE_DELIMITERS = [",", ";", "|", "\t"]


def sniff_delimiter(sample_text: str) -> str:
    """Detect the delimiter of a CSV sample; ',' when nothing matches."""
    detected: str | None = None
    try:
        dialect = csv.Sniffer().sniff(sample_text, delimiters=";,|\t")
        detected = dialect.delimiter
    except csv.Error:
        detected = None

    counts = {c: sample_text.count(c) for c in CANDIDATE_DELIMITERS}
    if detected is None:
        detected = max(CANDIDATE_DELIMITERS, key=lambda c: counts[c])
    if counts.get(detected, 0) == 0:
        detected = ","
    return detected


def sniff_text(path: str, max_bytes: int = 65536) -> str:
    """File-level head sample (the Lambda's ranged-GET analog,
    lambda_validator.py:68-74): first ``max_bytes`` decoded as UTF-8."""
    with open(path, "rb") as f:
        return f.read(max_bytes).decode("utf-8", errors="replace")
