"""bench.py anchor-defense contract (VERDICT r14 what's-wrong #1):
the committed BENCH_FULL.json snapshot is a >=2-run min-merge; a
single run of DIFFERENT code (the driver's closing invocation) must
divert to BENCH_SINGLE.json instead of clobbering the anchor, while
same-code runs and fresh anchors keep their existing semantics.

No Spark involved — ``_artifact_path`` is a pure filesystem decision.
"""

from __future__ import annotations

import importlib.util
import json
import os

_spec = importlib.util.spec_from_file_location(
    "bench",
    os.path.join(os.path.dirname(os.path.dirname(__file__)), "bench.py"),
)
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


def _write(path, code_rev, run_history):
    with open(path, "w") as fh:
        json.dump(
            {
                "code_rev": code_rev,
                "run_history": run_history,
                "queries": {"q1": 1.0},
            },
            fh,
        )


def _full(code_rev, run_history):
    return {"code_rev": code_rev, "run_history": run_history}


def test_single_run_different_code_diverts_to_side_artifact(tmp_path):
    anchor = str(tmp_path / "BENCH_FULL.json")
    _write(anchor, "aaaa", [230.0, 255.0])
    out = bench._artifact_path(_full("bbbb", [290.0]), anchor)
    assert out == str(tmp_path / "BENCH_SINGLE.json")
    # the anchor file itself was not touched by the decision
    assert json.load(open(anchor))["code_rev"] == "aaaa"


def test_same_code_single_run_overwrites(tmp_path):
    anchor = str(tmp_path / "BENCH_FULL.json")
    _write(anchor, "aaaa", [230.0, 255.0])
    assert bench._artifact_path(_full("aaaa", [240.0]), anchor) == anchor


def test_multi_run_result_always_lands_on_anchor(tmp_path):
    anchor = str(tmp_path / "BENCH_FULL.json")
    _write(anchor, "aaaa", [230.0, 255.0])
    # a merged (n_runs>=2) result is protocol-conformant by definition
    assert bench._artifact_path(_full("bbbb", [240.0, 250.0]), anchor) == anchor


def test_single_run_against_single_run_anchor_overwrites(tmp_path):
    anchor = str(tmp_path / "BENCH_FULL.json")
    _write(anchor, "aaaa", [230.0])
    assert bench._artifact_path(_full("bbbb", [240.0]), anchor) == anchor


def test_no_existing_anchor_writes_in_place(tmp_path):
    anchor = str(tmp_path / "BENCH_FULL.json")
    assert bench._artifact_path(_full("bbbb", [240.0]), anchor) == anchor


def test_corrupt_anchor_is_not_defended(tmp_path):
    anchor = str(tmp_path / "BENCH_FULL.json")
    with open(anchor, "w") as fh:
        fh.write("{not json")
    assert bench._artifact_path(_full("bbbb", [240.0]), anchor) == anchor


# --- seeded per-pass query order (VERDICT r15 next-round #1) ---------


def test_pass_order_is_a_permutation():
    names = [f"q{i:03d}" for i in range(100)]
    order = bench._pass_order(names, seed=42, pass_idx=0)
    assert sorted(order) == names
    assert order != names  # 100 items: an identity shuffle is 1/100!


def test_pass_order_deterministic_per_seed_and_pass():
    names = [f"q{i:03d}" for i in range(50)]
    assert bench._pass_order(names, 7, 1) == bench._pass_order(names, 7, 1)


def test_pass_order_differs_across_passes_and_seeds():
    names = [f"q{i:03d}" for i in range(50)]
    assert bench._pass_order(names, 7, 0) != bench._pass_order(names, 7, 1)
    assert bench._pass_order(names, 7, 0) != bench._pass_order(names, 8, 0)


def test_merge_min_folds_clock_and_seeds(tmp_path):
    anchor = str(tmp_path / "BENCH_FULL.json")
    with open(anchor, "w") as fh:
        json.dump(
            {
                "code_rev": "aaaa",
                "sf": 0.1,
                "queries": {"q1": 1.5, "q2": -1.0},
                "stages": {},
                "run_history": [100.0],
                "order_seeds": [11],
                "query_clock": {"q1": [0.0, 50.0], "q2": [25.0, 75.0]},
            },
            fh,
        )
    cur = {
        "code_rev": "aaaa",
        "sf": 0.1,
        "queries": {"q1": 2.0, "q2": 0.8},
        "stages": {},
        "run_history": [90.0],
        "order_seeds": [22],
        "query_clock": {"q1": [1.0], "q2": [40.0]},
    }
    out = bench._merge_min(cur, anchor, "aaaa")
    assert out["queries"] == {"q1": 1.5, "q2": 0.8}  # min; -1 never wins
    assert out["run_history"] == [100.0, 90.0]
    assert out["order_seeds"] == [11, 22]
    assert out["query_clock"] == {
        "q1": [0.0, 50.0, 1.0],
        "q2": [25.0, 75.0, 40.0],
    }
