"""hreflang translation clusters: rel=alternate harvesting through
the real parser (feed-link and template traps, malformed BCP 47
codes), edge-derived cluster membership, silent-member behavior."""

from __future__ import annotations

from pdf_extractor_spark.functions.hreflang import (
    LANGS,
    hreflang_clusters,
    hreflang_edges,
    wrap_html_hreflang,
)
from pdf_extractor_spark.operators.html_extract import harvest_directives

SF = "/root/testdata/sf0.001"


def _codes(doc_id: int) -> list[str]:
    return [
        v.split(" ")[0]
        for k, v in harvest_directives(wrap_html_hreflang("t", doc_id))
        if k == "hreflang"
    ]


class TestHarvest:
    def test_member_declares_full_group(self):
        assert _codes(1) == list(LANGS)

    def test_leader_adds_x_default(self):
        assert _codes(5) == list(LANGS) + ["x-default"]

    def test_silent_doc_declares_nothing(self):
        assert _codes(6) == [] and _codes(13) == []

    def test_malformed_code_still_harvested_raw(self):
        # BCP 47 validity is the CONSUMER's judgment; the parser must
        # not silently eat the entry
        assert "zz-inva!id" in _codes(10)

    def test_feed_link_is_not_a_translation(self):
        # rel=alternate with type= but no hreflang — on every page,
        # never harvested as hreflang
        out = harvest_directives(wrap_html_hreflang("t", 1))
        assert all("/feed.xml" not in v for k, v in out
                   if k == "hreflang")

    def test_template_declaration_inert(self):
        # doc 2: %6==2 plants an hreflang inside <template>
        assert all(not c.startswith("xx") for c in _codes(2))


class TestSparkClusters:
    def test_matches_duckdb_oracle(self, spark):
        import duckdb

        from pdf_extractor_spark.functions.hreflang import (
            duck_hreflang_sql,
        )

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        got = hreflang_clusters(docs).toPandas()
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')"
        )
        want = con.sql(duck_hreflang_sql()).df()
        cols = sorted(got.columns)
        gs = got[cols].sort_values(cols).reset_index(drop=True)
        ws = want[cols].sort_values(cols).reset_index(drop=True)
        assert len(gs) == len(ws) > 0
        assert (gs.to_numpy() == ws.to_numpy()).all()

    def test_cluster_survives_silent_members(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        got = hreflang_clusters(docs).toPandas().set_index("cluster_id")
        # cluster 5 (docs 5-9): doc 6 is silent (%7==6) but the
        # cluster forms from the other four declarers
        assert got.loc[5, "n_declaring"] == 4
        assert bool(got.loc[5, "has_default"])  # leader 5 declares
        # cluster 10 (docs 10-14): doc 13 silent; doc 10 has the
        # malformed extra
        assert got.loc[10, "n_declaring"] == 4
        assert got.loc[10, "n_invalid"] == 1

    def test_invalid_never_counts_as_translation(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        edges = hreflang_edges(docs).toPandas()
        bad = edges[~edges["valid"]]
        assert (bad["hreflang"] == "zz-inva!id").all()
        assert sorted(bad["src"] % 11) == [10] * len(bad)

    def test_plan_two_aggregates_no_cartesian(self, spark):
        from pdf_extractor_spark.functions.query_catalog import CATALOG

        df = CATALOG["corpus_hreflang_clusters"].spark(spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert plan.count("MapInPandas") == 1
        # exactly three exchanges: the doc-id spread feeding the
        # Arrow pass, then one per rollup — both carrying fixed-width
        # keys (src / cluster_id), never URL strings
        assert plan.count("Exchange") == 3
