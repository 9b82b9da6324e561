"""Tests for int8 embedding quantization recall
(similarity.int8_recall_report)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from pdf_extractor_spark.functions.similarity import (
    duck_int8_recall_sql,
    int8_recall_report,
)


def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>, label int",
    )


class TestInt8Recall:
    def test_well_separated_clusters_full_recall(self, spark):
        # two orthogonal clusters with jitter large enough that
        # within-cluster cosine gaps (~0.02) dwarf the int8
        # resolution (~1/127): neighbor order survives quantization.
        # (With near-identical vectors the gaps drop BELOW the
        # quantization step and recall legitimately degrades — the
        # exact regime this operator exists to measure.)
        rng = np.random.RandomState(5)
        a = np.tile([1.0, 0, 0, 0], (15, 1)) + rng.randn(15, 4) * 0.2
        b = np.tile([0, 1.0, 0, 0], (15, 1)) + rng.randn(15, 4) * 0.2
        emb = _emb(spark, np.vstack([a, b]))
        rep = int8_recall_report(emb, query_ids=(0, 15), k=5).collect()
        assert len(rep) == 2
        for r in rep:
            assert r.recall_bp == 10000
            assert r.mean_abs_err < 0.01

    def test_error_is_measured_not_zero(self, spark):
        # generic random vectors: int8 error must be small but REAL
        rng = np.random.RandomState(9)
        emb = _emb(spark, rng.randn(40, 16))
        rep = int8_recall_report(emb, query_ids=(0, 1), k=5).collect()
        for r in rep:
            assert 0 < r.mean_abs_err < 0.05
            assert 0 < r.n_overlap <= 5

    def test_oracle_matches(self, spark):
        rng = np.random.RandomState(11)
        emb = _emb(spark, rng.randn(30, 8))
        con = duckdb.connect()
        con.register("embeddings", emb.toPandas())
        got = con.execute(
            duck_int8_recall_sql(query_ids=(0, 3), k=5)
        ).fetchdf()
        want = int8_recall_report(emb, query_ids=(0, 3), k=5).toPandas()
        pd.testing.assert_frame_equal(
            want, got.astype(want.dtypes.to_dict()), rtol=1e-9
        )

    def test_zero_vector_excluded_not_crashing(self, spark):
        vecs = [[1.0, 0.0], [0.9, 0.1], [0.0, 0.0], [0.8, 0.2]]
        rep = int8_recall_report(
            _emb(spark, vecs), query_ids=(0,), k=2
        ).collect()
        assert len(rep) == 1
        assert rep[0].n_overlap == 2  # zero vec silently out of both
