"""Host-level template detection: flag semantics, consistency with
the dedup stack's SimHash, and the no-text-shuffle plan."""

from __future__ import annotations

from pdf_extractor_spark.functions.templates import (
    SIG_DEN,
    host_template_report,
)

SF = "/root/testdata/sf0.001"


class TestSemantics:
    def test_templated_hosts_flagged_diverse_hosts_not(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        rows = {r.host: r for r in
                host_template_report(docs).collect()}
        assert len(rows) == 20
        for host, r in rows.items():
            idx = int(host.removeprefix("site").removesuffix(
                ".example"))
            if idx % 5 == 0:   # templated: ≤ 4 signature variants
                assert r.templated and r.n_sigs <= 4, host
                assert r.dup_pct >= 50
            else:              # real corpus text: fully diverse
                assert not r.templated, host
                assert r.n_sigs == r.n_docs and r.dup_pct == 0
            assert r.n_sigs * SIG_DEN <= r.n_docs or not r.templated

    def test_signatures_match_dedup_stack(self, spark):
        """The per-host signatures ARE the dedup stack's SimHash —
        recompute one templated host's variants via simhash_pandas
        and compare the distinct count."""
        from pdf_extractor_spark.functions.dedup import simhash_pandas
        from pdf_extractor_spark.functions.templates import (
            _TEMPLATE_TEXT,
        )

        variants = [f"{_TEMPLATE_TEXT} {v}" for v in range(4)]
        expect = len(set(simhash_pandas(variants)))
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        rows = {r.host: r for r in
                host_template_report(docs).collect()}
        r = rows["site0.example"]
        assert r.n_sigs == min(expect, r.n_docs)


class TestPlan:
    def test_exchange_carries_sigs_not_text(self, spark):
        from pdf_extractor_spark.functions.query_catalog import CATALOG

        df = CATALOG["corpus_host_templates"].spark(spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        # text is read at the scan (it feeds the narrow simhash map)
        # but must never appear in an exchange
        for seg in plan.split("Exchange hashpartitioning")[1:]:
            assert "text" not in seg.split("\n")[0]
