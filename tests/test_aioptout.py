"""AI-training opt-out signals: noai token grammar, TDMRep metas and
headers, template inertness, explicit non-reservation, channel
composition, and the DuckDB twin."""

from __future__ import annotations

from pdf_extractor_spark.functions.aioptout import (
    parse_ai_tokens,
    wrap_html_aioptout,
)
from pdf_extractor_spark.operators.html_extract import harvest_directives

SF = "/root/testdata/sf0.001"


class TestTokens:
    def test_noai_family(self):
        assert parse_ai_tokens("noai") == (True, False)
        assert parse_ai_tokens(" NoAI , nofollow") == (True, False)
        assert parse_ai_tokens("noimageai, noindex") == (False, True)
        assert parse_ai_tokens("noindex") == (False, False)
        # substring must not match: 'noai' is a token, not a fragment
        assert parse_ai_tokens("paranoai") == (False, False)


class TestHarvest:
    def _directives(self, doc_id):
        return harvest_directives(wrap_html_aioptout("t", doc_id))

    def test_tdm_metas_harvested(self):
        d = dict(self._directives(3))
        assert d["tdm-reservation"] == "1"
        assert d["tdm-policy"].startswith("https://example.test/tdm-")

    def test_explicit_non_reservation(self):
        d = dict(self._directives(4))
        assert d["tdm-reservation"] == "0"

    def test_template_wrapped_tdm_is_inert(self):
        assert not any(
            k.startswith("tdm") for k, _v in self._directives(7)
        )

    def test_robots_meta_carries_ai_tokens(self):
        d = dict(self._directives(2))
        assert parse_ai_tokens(d["robots"]) == (False, True)


class TestSparkOracle:
    def test_matches_duckdb_oracle(self, spark):
        import duckdb

        from pdf_extractor_spark.functions.aioptout import (
            ai_optout_signals, duck_aioptout_sql,
        )

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        got = ai_optout_signals(docs).toPandas()
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')"
        )
        want = con.sql(duck_aioptout_sql()).df()
        cols = sorted(got.columns)
        gs = got[cols].sort_values(cols).reset_index(drop=True)
        ws = want[cols].sort_values(cols).reset_index(drop=True)
        assert len(gs) == len(ws) > 0
        assert (gs.to_numpy() == ws.to_numpy()).all()
        # the header-only channels actually fire in the fixture set
        assert bool(got[got.doc_id % 9 == 5].noai.all())
        assert bool(got[got.doc_id % 9 == 6].tdm_reserved.all())


class TestComplianceGate:
    def test_reason_precedence_and_composition(self, spark):
        import duckdb

        from pdf_extractor_spark.functions.compliance import (
            compliance_gate, duck_compliance_sql,
        )

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        got = compliance_gate(docs).toPandas()
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')"
        )
        want = con.sql(duck_compliance_sql()).df()
        cols = sorted(got.columns)
        gs = got[cols].sort_values(cols).reset_index(drop=True)
        ws = want[cols].sort_values(cols).reset_index(drop=True)
        assert (gs.to_numpy() == ws.to_numpy()).all()
        # every reason actually fires on the fixture corpus, and the
        # gate is not vacuous in either direction
        assert set(got.reason.unique()) == {
            "", "noindex", "noai", "tdm-reservation", "license"}
        assert 0 < got.keep.sum() < len(got)
        # precedence: a doc that is BOTH noindex (header, %5==0) and
        # noai (%9==1) must report the higher-precedence noindex
        both = got[(got.doc_id % 5 == 0) & (got.doc_id % 9 == 1)]
        if len(both):
            assert (both.reason == "noindex").all()
