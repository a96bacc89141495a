"""Shared argparse types for the job entrypoints (corpus_job / stats_job)."""

from __future__ import annotations

import argparse


def band_type(s: str) -> tuple[float, float]:
    """``LO:HI`` → (lo, hi), validated at PARSE time: a malformed band must
    fail as an argparse error naming the flag, not a bare unpack ValueError
    after the Spark session is already up."""
    parts = s.split(":")
    try:
        lo, hi = (float(x) for x in parts)
    except ValueError:
        raise argparse.ArgumentTypeError(
            f"expected LO:HI (two floats, e.g. 0.2:0.95), got {s!r}")
    if not 0.0 <= lo <= hi:
        raise argparse.ArgumentTypeError(
            f"need 0 <= LO <= HI, got {s!r}")
    return (lo, hi)
