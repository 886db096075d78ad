"""Recording-window rotation unit tests (r6, VERDICT r5 next #9): the
driver records only the first 50 queries() entries, so the ordering is
DERIVED from the latest CORRECTNESS file — unrecorded queries first."""

import json

from pq_engine.rotation import latest_correctness, rotate_keys


def test_rotate_unrecorded_first(tmp_path):
    (tmp_path / "CORRECTNESS_r04.json").write_text(json.dumps({"a": 1}))
    (tmp_path / "CORRECTNESS_r05.json").write_text(
        json.dumps({"b": {"ok": True}, "d": {"ok": True}}))
    assert latest_correctness(str(tmp_path)).endswith("CORRECTNESS_r05.json")
    # b and d were recorded in r05 -> rotate to the back, order stable
    assert rotate_keys(["a", "b", "c", "d"], str(tmp_path)) == \
        ["a", "c", "b", "d"]


def test_rotate_no_file_or_garbage_is_identity(tmp_path):
    keys = ["x", "y"]
    assert rotate_keys(keys, str(tmp_path)) == keys
    (tmp_path / "CORRECTNESS_r01.json").write_text("{not json")
    assert rotate_keys(keys, str(tmp_path)) == keys


def test_driver_queries_rotated_by_construction():
    """The repo's own queries() must place every query missing from the
    latest CORRECTNESS file inside the 50-entry recording window."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    import __spark_entry__ as entry
    from pq_engine.rotation import latest_correctness

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = latest_correctness(repo)
    if path is None:
        return  # fresh checkout: nothing to rotate against
    with open(path) as f:
        recorded = set(json.load(f))
    keys = list(entry.queries())
    unrecorded = [k for k in keys if k not in recorded]
    window = set(keys[:50])
    missing = [k for k in unrecorded if k not in window]
    assert not missing or len(unrecorded) > 50, (
        f"queries outside the recording window that r-latest did not "
        f"record: {missing}")
