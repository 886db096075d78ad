"""Programmatic recording-window rotation for the driver contract.

The round driver records only the FIRST 50 entries of ``queries()`` into
CORRECTNESS_r{N}.json. To guarantee consecutive rounds jointly record
every query (VERDICT r4 "what's wrong" #1, r5 "next" #9: derive the
window, don't hand-order it), the dict is reordered each round so that
queries ABSENT from the latest recorded CORRECTNESS file come first —
new queries and past-window queries land inside the window by
construction, and CORRECTNESS_r{N} ∪ CORRECTNESS_r{N-1} covers the full
set whenever the unrecorded block fits in one window.

``tools/check_oracle.py`` still gates every query every round; rotation
only decides which subset the driver's artifact records.
"""

from __future__ import annotations

import json
import os
import re


def latest_correctness(repo_dir: str) -> str | None:
    """Path of the highest-numbered CORRECTNESS_r*.json, or None."""
    best, best_n = None, -1
    try:
        names = os.listdir(repo_dir)
    except OSError:
        return None
    for name in names:
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", name)
        if m and int(m.group(1)) > best_n:
            best, best_n = os.path.join(repo_dir, name), int(m.group(1))
    return best


def rotate_keys(keys: list[str], repo_dir: str) -> list[str]:
    """Reorder ``keys``: those not recorded in the latest CORRECTNESS
    file first (original relative order preserved in both groups). With
    no readable CORRECTNESS file the order is unchanged."""
    path = latest_correctness(repo_dir)
    if path is None:
        return list(keys)
    try:
        with open(path) as f:
            recorded = set(json.load(f))
    except (OSError, ValueError):
        return list(keys)
    fresh = [k for k in keys if k not in recorded]
    seen = [k for k in keys if k in recorded]
    return fresh + seen
