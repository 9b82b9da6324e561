"""URL parameter-significance learning: rule semantics, the
conservative veto, and the fixed-width-key exchange plan."""

from __future__ import annotations

from pdf_extractor_spark.functions.urlparams import (
    N_HOSTS,
    param_rules,
    synth_pages,
)

SF = "/root/testdata/sf0.001"


class TestSemantics:
    def test_tracking_param_strippable_significant_not(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        rows = {(r.host, r.param): r
                for r in param_rules(synth_pages(docs)).collect()}
        hosts = {h for h, _ in rows}
        assert len(hosts) == N_HOSTS
        for host in hosts:
            utm = rows[(host, "utm")]
            assert utm.strippable, host
            assert utm.max_content_variants == 1
            assert utm.evidence_groups >= 1
            sort = rows[(host, "sort")]
            assert not sort.strippable, host
            assert sort.max_content_variants == 2

    def test_single_counterexample_vetoes(self, spark):
        """One residual group with two contents under the same param
        value set vetoes the rule even if every other group is
        clean — the conservative direction."""
        clean = [
            (f"https://a.example/p/{i}?tag=0&x={v}", i)
            for i in range(5) for v in (0, 1)
        ]
        poison = [
            ("https://a.example/p/99?tag=0&x=0", 990),
            ("https://a.example/p/99?tag=0&x=1", 991),
        ]
        df = spark.createDataFrame(
            clean + poison, ["url", "content_fp"]
        )
        rows = {r.param: r for r in param_rules(df).collect()}
        assert not rows["x"].strippable
        assert rows["x"].max_content_variants == 2
        # the tag param never varies → no evidence → not strippable
        assert not rows["tag"].strippable
        assert rows["tag"].evidence_groups == 0

    def test_no_evidence_means_no_rule(self, spark):
        """A param observed at a single value everywhere must not be
        declared strippable from absence of counter-examples."""
        df = spark.createDataFrame(
            [(f"https://b.example/p/{i}?only=7", i) for i in range(4)],
            ["url", "content_fp"],
        )
        [r] = param_rules(df).collect()
        assert r.param == "only" and not r.strippable


class TestPlan:
    def test_exchanges_carry_hashed_keys_never_urls(self, spark):
        from pdf_extractor_spark.functions.query_catalog import CATALOG

        df = CATALOG["corpus_url_param_rules"].spark(spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        # the raw url / base / pairs columns feed the narrow parse map
        # but must never cross an exchange — the group key is the md5
        # of the residual, fixed width
        for seg in plan.split("Exchange hashpartitioning")[1:]:
            head = seg.split("\n")[0]
            for col in ("url#", "base#", "pairs#"):
                assert col not in head, head


class TestDustStrip:
    def test_matches_duckdb_oracle(self, spark):
        import duckdb

        from pdf_extractor_spark.functions.urlparams import (
            duck_dust_strip_sql, dust_strip_report,
        )

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        got = dust_strip_report(docs).toPandas()
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')"
        )
        want = con.sql(duck_dust_strip_sql()).df()
        cols = sorted(got.columns)
        gs = got[cols].sort_values(cols).reset_index(drop=True)
        ws = want[cols].sort_values(cols).reset_index(drop=True)
        assert len(gs) == len(ws) > 0
        assert (gs.to_numpy() == ws.to_numpy()).all()

    def test_collapse_ratio(self, spark):
        from pdf_extractor_spark.functions.urlparams import (
            dust_strip_report,
        )

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        got = dust_strip_report(docs).toPandas()
        # every host learned exactly one rule (utm), and full
        # 8-variant groups collapse 4:1 → n_after < n_raw everywhere
        assert (got["n_rules"] == 1).all()
        assert (got["n_after"] < got["n_raw"]).all()

    def test_rules_broadcast_not_shuffled(self, spark):
        from pdf_extractor_spark.functions.query_catalog import CATALOG

        df = CATALOG["corpus_dust_strip"].spark(spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastHashJoin" in plan
