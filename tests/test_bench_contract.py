"""Contract tests for the bench harness's plan-stability signal.

Job counts are deterministic per compiled plan, so bench.py compares the
run's jobs map against the checked-in BENCH_JOBS_BASELINE.json and puts
``plan_stable`` in its headline JSON.  These tests pin the comparison
semantics — in particular the SF gate: CC and recursive-CTE round
counts are data-driven, so the baseline is only comparable at the scale
factor it was captured at (a cross-SF compare must make NO claim rather
than report phantom plan changes).
"""

from __future__ import annotations

import importlib.util
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_spec = importlib.util.spec_from_file_location("bench", os.path.join(REPO, "bench.py"))
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


def _write(tmp_path, payload):
    p = os.path.join(str(tmp_path), "baseline.json")
    with open(p, "w") as f:
        json.dump(payload, f)
    return p


def test_same_sf_reports_deltas(tmp_path):
    p = _write(tmp_path, {"__sf__": 0.1, "a": 3, "b": 7})
    deltas, sf = bench.plan_deltas_vs_baseline({"a": 3, "b": 9}, 0.1, p)
    assert sf == 0.1
    assert deltas == {"b": [7, 9]}


def test_same_sf_stable_is_empty_dict_not_none(tmp_path):
    p = _write(tmp_path, {"__sf__": 0.1, "a": 3})
    deltas, _ = bench.plan_deltas_vs_baseline({"a": 3}, 0.1, p)
    assert deltas == {}  # empty == plan-stable claim, distinct from None


def test_cross_sf_makes_no_claim(tmp_path):
    p = _write(tmp_path, {"__sf__": 0.1, "a": 3})
    deltas, sf = bench.plan_deltas_vs_baseline({"a": 9}, 0.001, p)
    assert deltas is None  # no phantom "plan change" across SFs
    assert sf == 0.1


def test_untagged_baseline_compares_at_any_sf(tmp_path):
    # legacy baseline without __sf__: keep the old behavior
    p = _write(tmp_path, {"a": 3})
    deltas, sf = bench.plan_deltas_vs_baseline({"a": 4}, 0.001, p)
    assert deltas == {"a": [3, 4]}
    assert sf is None


def test_missing_baseline_makes_no_claim(tmp_path):
    deltas, sf = bench.plan_deltas_vs_baseline(
        {"a": 1}, 0.1, os.path.join(str(tmp_path), "nope.json")
    )
    assert deltas is None and sf is None


def test_new_queries_not_in_baseline_are_ignored(tmp_path):
    # a freshly added query has no baseline row; it must not crash or
    # count as a delta (bench_diff reports additions separately)
    p = _write(tmp_path, {"__sf__": 0.1, "a": 3})
    deltas, _ = bench.plan_deltas_vs_baseline({"a": 3, "zz_new": 5}, 0.1, p)
    assert deltas == {}


def test_checked_in_baseline_is_sf_tagged_and_covers_registry():
    with open(os.path.join(REPO, "BENCH_JOBS_BASELINE.json")) as f:
        baseline = json.load(f)
    assert baseline.pop("__sf__", None) == 0.1

    from dask_snowflake_spark.queries import registry

    names = set(registry()) - {"x46_dedup_ngram_jaccard"}  # bench-excluded
    missing = names - set(baseline)
    stale = set(baseline) - names
    assert not missing, f"baseline missing bench queries: {sorted(missing)}"
    assert not stale, f"baseline has stale queries: {sorted(stale)}"


def test_removed_queries_count_as_deltas(tmp_path):
    # a query deleted/renamed without refreshing the baseline must NOT
    # read as plan-stable: coverage shrank (surfaces as [old, None])
    p = _write(tmp_path, {"__sf__": 0.1, "a": 3, "gone": 7})
    deltas, _ = bench.plan_deltas_vs_baseline({"a": 3}, 0.1, p)
    assert deltas == {"gone": [7, None]}


def test_malformed_baseline_makes_no_claim(tmp_path):
    # a non-dict baseline (bad merge) must degrade to "no claim", never
    # crash after the bench loop and lose the driver-tailed headline
    p = os.path.join(str(tmp_path), "baseline.json")
    with open(p, "w") as f:
        f.write('["not", "a", "jobs", "map"]')
    deltas, sf = bench.plan_deltas_vs_baseline({"a": 1}, 0.1, p)
    assert deltas is None and sf is None


def test_job_deltas_is_the_single_comparison():
    # shared by the bench headline and tools/bench_diff.py: changed
    # commons + old-side-only queries; new-side-only ignored
    assert bench.job_deltas({"a": 3, "b": 7, "c": 1}, {"a": 3, "b": 9, "d": 2}) == {
        "b": [7, 9],
        "c": [1, None],
    }


def _headline_base():
    return {
        "metric": "total_query_sec",
        "value": 319.3,
        "unit": "sec",
        "sf": 0.1,
        "n_queries": 259,
        "n_passes": 3,
        "value_median": 355.7,
        "spread_total_sec": 111.66,
        "calib_sec": 0.924,
        "host_factor": 0.884,
        "value_host_normalized": 361.2,
        "detail": "BENCH_QUERIES.json",
        "plan_stable": True,
    }


def _registry_sized_maps(n=259):
    # realistic name lengths (~19 chars average in the real registry)
    timings = {f"q{i:03d}_{'x' * 14}": round(0.3 + (i % 40) / 7.0, 2) for i in range(n)}
    jobs = {k: 3 + (i % 30) for i, k in enumerate(timings)}
    return timings, jobs


def test_headline_carries_per_query_topk_and_fits_tail_capture():
    timings, jobs = _registry_sized_maps()
    line = bench.headline_line(_headline_base(), timings, jobs)
    assert len(line) <= bench.TAIL_BUDGET  # driver tail capture is 2000
    parsed = json.loads(line)
    # every existing headline key survives (additive contract)
    for k in _headline_base():
        assert k in parsed
    # per-query maps present, ordered most-expensive-first, jobs aligned
    qs = parsed["queries"]
    assert qs and set(qs) <= set(timings)
    costs = list(qs.values())
    assert costs == sorted(costs, reverse=True)
    assert set(parsed["jobs"]) == set(qs)
    # the included entries are exactly the global top-|qs| by cost
    by_cost = sorted(timings, key=lambda n: (-timings[n], n))
    assert list(qs) == by_cost[: len(qs)]


def test_headline_survives_pathological_job_deltas():
    timings, jobs = _registry_sized_maps()
    h = _headline_base()
    h["plan_stable"] = False
    h["job_deltas"] = {f"q{i:03d}_{'y' * 20}": [3, 4] for i in range(200)}
    line = bench.headline_line(h, timings, jobs)
    assert len(line) <= bench.TAIL_BUDGET
    parsed = json.loads(line)
    assert parsed["job_deltas"] == {"n_deltas": 200}  # summarized, still parses
    assert parsed["queries"]  # maps still present after summarizing


def test_headline_keeps_small_job_deltas_verbatim():
    timings, jobs = _registry_sized_maps()
    h = _headline_base()
    h["plan_stable"] = False
    h["job_deltas"] = {"hits_bipartite": [48, 24]}
    parsed = json.loads(bench.headline_line(h, timings, jobs))
    assert parsed["job_deltas"] == {"hits_bipartite": [48, 24]}
