"""Tests for sequence packing (functions/packing.py)."""

from __future__ import annotations

import duckdb

from pdf_extractor_spark.functions.packing import (
    duck_pack_sql,
    pack_sequences,
)

SF = "/root/testdata/sf0.001"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestPackSequences:
    def test_hand_computed_assignment(self, spark):
        # budget 10: docs of 4/5/3/9 tokens start at 0,4,9,12 →
        # sequences 0,0,0,1 with offsets 0,4,9,2
        rows = [
            (0, "a b c d"),
            (1, "e f g h i"),
            (2, "j k l"),
            (3, "m n o p q r s t u"),
        ]
        got = {
            r.doc_id: r
            for r in pack_sequences(
                _docs(spark, rows), budget=10, shard_docs=100
            ).collect()
        }
        assert [
            (got[i].seq_in_shard, got[i].seq_offset) for i in range(4)
        ] == [(0, 0), (0, 4), (0, 9), (1, 2)]

    def test_shards_pack_independently(self, spark):
        # same text in two shards → identical within-shard layout,
        # sequences keyed by the composite (shard_id, seq_in_shard)
        rows = [(i, "w1 w2 w3 w4 w5") for i in range(4)]
        rows += [(100 + i, "w1 w2 w3 w4 w5") for i in range(4)]
        got = {
            r.doc_id: r
            for r in pack_sequences(
                _docs(spark, rows), budget=12, shard_docs=100
            ).collect()
        }
        for i in range(4):
            a, b = got[i], got[100 + i]
            assert (a.shard_id, b.shard_id) == (0, 1)
            assert a.seq_in_shard == b.seq_in_shard
            assert a.seq_offset == b.seq_offset

    def test_offsets_within_budget_and_start_coverage(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        pdf = pack_sequences(docs).toPandas()
        assert (pdf.seq_offset >= 0).all()
        assert (pdf.seq_offset < 256).all()
        # sequence ids within a shard are contiguous from 0: a doc
        # starts in every sequence (docs are shorter than the budget)
        for _, grp in pdf.groupby("shard_id"):
            local = sorted(grp.seq_in_shard.unique())
            assert local == list(range(len(local)))

    def test_matches_duckdb_twin(self, spark):
        sdf = (
            pack_sequences(spark.read.parquet(f"{SF}/documents.parquet"))
            .toPandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')"
        )
        odf = (
            con.execute(duck_pack_sql())
            .df()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        odf = odf.astype(sdf.dtypes.to_dict())
        assert sdf.equals(odf)

    def test_single_exchange_on_shard_key_text_stays_put(self, spark):
        import re

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        plan = (
            pack_sequences(docs)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        keys = re.findall(r"Exchange hashpartitioning\(([^,]*)", plan)
        assert len(keys) == 1 and keys[0].startswith("shard_id")
        # token counting is projected BEFORE the exchange: only
        # (doc_id, shard_id, n_tokens) shuffles, never text
        assert "text" not in " ".join(
            re.findall(r"Exchange [^\n]*", plan)
        )
