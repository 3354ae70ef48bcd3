"""Property-based tests for the partition planner (hypothesis):
invariants that must hold for ANY batch distribution, not just the
fixtures the reference tests used."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from dask_snowflake_spark.plans.partitioning import parse_bytes, plan_partitions

rowcounts = st.lists(st.integers(min_value=0, max_value=100_000), min_size=0, max_size=500)


@given(rowcounts, st.integers(min_value=1, max_value=64))
@settings(max_examples=200, deadline=None)
def test_every_batch_assigned_exactly_once(rc, nparts):
    groups = plan_partitions(rc, bytes_per_row=10.0, npartitions=nparts)
    flat = [i for g in groups for i in g]
    nonempty = [i for i, r in enumerate(rc) if r > 0]
    assert sorted(flat) == nonempty  # no loss, no duplication, empties dropped


@given(rowcounts, st.floats(min_value=0.1, max_value=1e6))
@settings(max_examples=200, deadline=None)
def test_size_bound_holds(rc, bpr):
    """Every group except singletons stays under 2x the byte target
    (oversized single batches can't be split client-side)."""
    target = parse_bytes("1MiB")
    groups = plan_partitions(rc, bytes_per_row=bpr, partition_size="1MiB")
    target_rows = max(1, int(target / bpr))
    for g in groups:
        rows = sum(rc[i] for i in g)
        if len(g) > 1:
            assert rows < 2 * target_rows


@given(rowcounts)
@settings(max_examples=100, deadline=None)
def test_order_preserved(rc):
    """Groups preserve batch order (warehouse result order is scan
    order; interleaving would reorder rows within partitions)."""
    groups = plan_partitions(rc, bytes_per_row=10.0, npartitions=4)
    flat = [i for g in groups for i in g]
    assert flat == sorted(flat)


def test_npartitions_ceil_target_holds_tolerance_on_unit_batches():
    """13 unit batches at npartitions=7: the floored row target (1)
    produced 13 partitions — |13-7| far past the ±2 contract; the ceil
    target (2) packs exactly 7."""
    groups = plan_partitions([1] * 13, bytes_per_row=1.0, npartitions=7)
    assert len(groups) == 7
    for n in range(1, 30):
        got = len(plan_partitions([1] * 100, bytes_per_row=1.0, npartitions=n))
        assert abs(got - n) <= 2, (n, got)
