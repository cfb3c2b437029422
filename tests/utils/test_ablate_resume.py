"""Crash-safe resume semantics of tools/ablate_accuracy.py.

A campaign that crashes between an arm's evals leaves stale partial records
which a retrain then duplicates; resume must dedup per (arm, seed, label)
keeping the last record, tolerate a truncated tail line, and only mark a
pair done when every eval label of the arm is present.
"""
import importlib.util
import json
import os
import sys

_REPO = os.path.join(os.path.dirname(__file__), "..", "..")


def _load_tool():
    sys.path.insert(0, _REPO)
    sys.path.insert(0, os.path.join(_REPO, "tools"))
    try:
        spec = importlib.util.spec_from_file_location(
            "ablate_tool_mod", os.path.join(_REPO, "tools",
                                            "ablate_accuracy.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        sys.path.pop(0)
        sys.path.pop(0)
    return mod


def _rec(arm, seed, label, ap):
    return {"label": label, "arm": arm, "seed": seed, "AP": ap,
            "AP50": -1, "AR": -1}


def test_dedup_keeps_last_and_requires_all_labels(tmp_path):
    mod = _load_tool()
    path = tmp_path / "r.jsonl"
    lines = [
        # stale partial from a crashed udp run (only 1 of 2 eval labels)
        _rec("udp", 0, "udp", 0.50),
        # the retrain's fresh, complete records (udp label duplicated)
        _rec("udp", 0, "udp", 0.80),
        _rec("udp", 0, "udp+dark", 0.82),
        # a complete plain pair
        _rec("plain", 1, "plain", 0.70),
        # an incomplete udp pair for another seed: must NOT be done
        _rec("udp", 2, "udp", 0.60),
    ]
    path.write_text("\n".join(json.dumps(r) for r in lines) + "\n")
    runs, done = mod.load_completed_runs(str(path))
    assert done == {("udp", 0), ("plain", 1)}
    # the stale 0.50 partial must not survive into the report
    udp_aps = sorted(r["AP"] for r in runs if r["arm"] == "udp")
    assert udp_aps == [0.80, 0.82]
    assert len(runs) == 3


def test_truncated_tail_line_is_skipped(tmp_path):
    mod = _load_tool()
    path = tmp_path / "r.jsonl"
    good = json.dumps(_rec("plain", 0, "plain", 0.9))
    path.write_text(good + "\n" + '{"label": "plain", "arm": "pl')
    runs, done = mod.load_completed_runs(str(path))
    assert done == {("plain", 0)}
    assert len(runs) == 1
