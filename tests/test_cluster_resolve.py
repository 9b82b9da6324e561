"""Tests for near-dup cluster resolution (round 2): connected
components by min-label propagation, cluster stats, and the keep-one
dedup decision."""

from __future__ import annotations

from pdf_extractor_spark.functions.dedup import (
    cluster_stats,
    connected_components,
    dedup_resolution,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "doc_a long, doc_b long")


class TestConnectedComponents:
    def test_two_disjoint_clusters(self, spark):
        comp = dict(
            connected_components(
                _edges(spark, [(1, 2), (2, 3), (10, 11)])
            ).collect()
        )
        assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}

    def test_path_graph_needs_multiple_rounds(self, spark):
        # a 9-node path: min label must propagate across the diameter
        comp = dict(
            connected_components(
                _edges(spark, [(i, i + 1) for i in range(1, 9)])
            ).collect()
        )
        assert set(comp.values()) == {1}
        assert len(comp) == 9

    def test_long_path_graph_log_rounds(self, spark):
        """Round-2 verdict item #5 'done' gate: a 100-node path
        (diameter 99) converges well inside CC_MAX_ITER=25 thanks to
        pointer jumping — plain min-label propagation needed 99
        rounds here and raised."""
        comp = dict(
            connected_components(
                _edges(spark, [(i, i + 1) for i in range(1, 100)])
            ).collect()
        )
        assert set(comp.values()) == {1}
        assert len(comp) == 100

    def test_star_graph(self, spark):
        comp = dict(
            connected_components(
                _edges(spark, [(5, 100 + i) for i in range(6)])
            ).collect()
        )
        assert set(comp.values()) == {5}

    def test_order_independent(self, spark):
        # edge direction/order must not matter (symmetrized inside)
        a = dict(
            connected_components(
                _edges(spark, [(3, 1), (2, 3)])
            ).collect()
        )
        b = dict(
            connected_components(
                _edges(spark, [(1, 3), (3, 2)])
            ).collect()
        )
        assert a == b == {1: 1, 2: 1, 3: 1}


class TestClusterStats:
    def test_sizes_and_removed(self, spark):
        rows = cluster_stats(
            _edges(spark, [(1, 2), (2, 3), (10, 11)])
        ).collect()
        got = {r.component: (r.n_members, r.n_removed) for r in rows}
        assert got == {1: (3, 2), 10: (2, 1)}


class TestDedupResolution:
    def test_keep_singletons_and_minima(self, spark):
        docs = spark.createDataFrame(
            [(i, f"text {i}") for i in (1, 2, 3, 10, 11, 42)],
            "doc_id long, text string",
        )
        out = {
            r.doc_id: bool(r.keep)
            for r in dedup_resolution(
                docs, _edges(spark, [(1, 2), (2, 3), (10, 11)])
            ).collect()
        }
        # cluster minima and the untouched singleton survive
        assert out == {
            1: True, 2: False, 3: False,
            10: True, 11: False, 42: True,
        }


class TestNonConvergence:
    def test_raises_when_diameter_exceeds_max_iter(self, spark):
        import pytest as _pytest

        with _pytest.raises(RuntimeError, match="did not converge"):
            connected_components(
                _edges(spark, [(i, i + 1) for i in range(1, 9)]),
                max_iter=2,
            )
