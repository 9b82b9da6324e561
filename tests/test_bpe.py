"""Frozen BPE tokenizer: training determinism, hand-verified merges,
application properties, and the Spark counting stage."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_extractor_spark.functions.bpe import (
    MERGES,
    SEED_LEXICON,
    bpe_token_count,
    bpe_tokens,
    train_merges,
)


class TestTraining:
    def test_training_is_deterministic(self):
        assert train_merges() == MERGES
        assert train_merges() == train_merges()

    def test_hand_computed_toy_training(self):
        # lexicon {"aa": 3, "ab": 1}: round-1 pair frequencies are
        # (a,a)=3, (a,</w>)=3, (a,b)=1, (b,</w>)=1 — a TIE between
        # (a,a) and (a,</w>), broken lexicographically: ('a','a') >
        # ('a','</w>') so (a,a) merges first. Round 2: "aa" is
        # [aa, </w>] x3 -> (aa,</w>)=3 wins; the x1 pairs never
        # reach the freq>=2 threshold.
        merges = train_merges((("aa", 3), ("ab", 1)), n_merges=3)
        assert merges == [("a", "a"), ("aa", "</w>")]

    def test_frequent_seed_words_are_single_tokens(self):
        for w in ("the", "a", "table", "spark", "window"):
            assert bpe_tokens(w) == [w + "</w>"], w

    def test_every_seed_word_has_stable_count(self):
        # freezing: counts must match the merge-table application
        for w, _n in SEED_LEXICON:
            assert bpe_token_count(w) == len(bpe_tokens(w))
            assert 1 <= bpe_token_count(w) <= len(w) + 1


class TestApplication:
    def test_unseen_word_totality(self):
        toks = bpe_tokens("xyzzy")
        assert "".join(toks) == "xyzzy</w>"

    @settings(max_examples=50, deadline=None)
    @given(st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1,
                   max_size=12))
    def test_tokens_always_reassemble(self, word):
        toks = bpe_tokens(word)
        assert "".join(toks) == word + "</w>"
        assert bpe_token_count(word) == len(toks)

    def test_empty_word(self):
        assert bpe_tokens("") == ["</w>"]


class TestSparkStage:
    def test_counts_against_python_reference(self, spark):
        from pdf_extractor_spark.functions.bpe import bpe_token_counts

        rows = [
            (1, "the table scan is fast"),
            (2, "unseenword xyzzy the"),
            (3, ""),
            (4, "a  a"),  # double space: empty tokens dropped
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["doc_id"]: r for r in bpe_token_counts(df).collect()}
        for doc_id, text in rows:
            ws = [w for w in text.split(" ") if w]
            assert got[doc_id]["n_words"] == len(ws)
            assert got[doc_id]["n_bpe_tokens"] == sum(
                bpe_token_count(w) for w in ws
            )
