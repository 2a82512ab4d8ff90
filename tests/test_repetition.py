"""Repetition / boilerplate curation filters (operators/repetition.py):
hand-computed semantics on tiny fixtures + the plan shapes the 100 TB
story depends on (no window, no Python UDF, one tokenizing pass,
broadcast join-back)."""

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from sparkcrawl.operators import repetition
from sparkcrawl.operators._caching import release_caches


def _plan(df, mode="simple") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


@pytest.fixture()
def docs(spark):
    rows = [
        # "spam spam spam spam": 4 words 1 distinct -> dup_word 0.75;
        # bigrams: 3x "spam spam" -> top_bigram 1.0;
        # trigrams: 2x "spam spam spam" -> dup_trigram 0.5
        (1, "spam spam spam spam"),
        # all-distinct words: every fraction 0
        (2, "the quick brown fox"),
        # < 3 words: dropped
        (3, "hi there"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_repetition_metrics_hand_computed(docs):
    got = {
        r["id"]: r.asDict() for r in repetition.repetition_metrics(docs).collect()
    }
    assert set(got) == {1, 2}  # doc 3 dropped (no trigram)
    assert got[1]["n_words"] == 4
    assert got[1]["dup_word_frac"] == 0.75
    assert got[1]["top_bigram_frac"] == 1.0
    assert got[1]["dup_trigram_frac"] == 0.5
    assert got[2]["dup_word_frac"] == 0.0
    assert got[2]["top_bigram_frac"] == pytest.approx(1 / 3, abs=1e-6)
    assert got[2]["dup_trigram_frac"] == 0.0


def test_repetition_metrics_case_folded(spark):
    df = spark.createDataFrame([(1, "Ham HAM ham")], ["doc_id", "text"])
    row = repetition.repetition_metrics(df).collect()[0]
    assert row["dup_word_frac"] == pytest.approx(2 / 3, abs=1e-6)


def test_repetition_plan_shape(docs):
    """One tokenizing Generate, two hash aggs, no window, no Python."""
    df = repetition.repetition_metrics(docs)
    p = _plan(df)
    assert "Window" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert p.count("Generate") == 1  # text is exploded exactly once
    assert "HashAggregate" in p


@pytest.fixture()
def corpus(spark):
    # "aa bb cc" trigram shared by 5 docs (boilerplate at min_docs=5);
    # each doc also has one unique tail trigram.
    rows = [(i, f"aa bb cc u{i} v{i}") for i in range(5)]
    rows.append((99, "xx yy zz ww qq"))
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_boilerplate_ngrams(corpus):
    got = repetition.boilerplate_ngrams(corpus, n=3, min_docs=5, k=10).collect()
    assert [(r["gram"], r["doc_freq"], r["occurrences"]) for r in got] == [
        ("aa bb cc", 5, 5)
    ]


def test_boilerplate_share(corpus):
    try:
        got = {
            r["id"]: r.asDict()
            for r in repetition.boilerplate_share(corpus, n=3, min_docs=5).collect()
        }
    finally:
        release_caches()
    # docs 0-4: 3 trigrams each, 1 boilerplate
    for i in range(5):
        assert got[i]["n_grams"] == 3
        assert got[i]["bp_grams"] == 1
        assert got[i]["bp_frac"] == pytest.approx(1 / 3, abs=1e-6)
    assert got[99]["bp_grams"] == 0 and got[99]["bp_frac"] == 0.0


def test_boilerplate_share_broadcasts_gram_table(corpus):
    df = repetition.boilerplate_share(corpus, n=3, min_docs=5)
    p = _plan(df)
    release_caches()
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_domain_mixing_weights(spark):
    from sparkcrawl.operators.sampling import domain_mixing_weights

    df = spark.createDataFrame(
        [(1, "a b c d", "s1"), (2, "e f", "s1"), (3, "g h", "s2")],
        ["doc_id", "text", "source"],
    )
    got = {r["source"]: r.asDict() for r in domain_mixing_weights(df).collect()}
    assert got["s1"]["n_docs"] == 2 and got["s1"]["tokens"] == 6
    assert got["s2"]["tokens"] == 2
    total = got["s1"]["weight"] + got["s2"]["weight"]
    assert total == pytest.approx(1.0, abs=1e-5)
    # alpha=0.7 damping: s1's weight share < its raw token share (6/8)
    assert got["s1"]["weight"] < 6 / 8
    assert got["s1"]["weight"] > got["s2"]["weight"]


def test_gopher_quality_rules_verdicts(spark):
    from sparkcrawl.operators.repetition import gopher_quality_rules

    good = "the cat and the dog " + " ".join(f"word{i}" for i in range(60))
    rows = [
        (1, good),                                   # passes everything
        (2, "the and short doc"),                    # fails word count
        (3, good + " " + "#" * 40),                  # symbol ratio trips
        (4, "- a\n- b"),                             # all lines bulleted
        (5, good.replace("word", "...\nend...")),    # ellipsis line endings
        (6, "the and " + " ".join(str(i) for i in range(60))),  # numeric words
        (7, " ".join(f"word{i}" for i in range(60))),  # no stop words
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["id"]: r for r in gopher_quality_rules(docs).collect()}
    assert out[1]["keep"]
    assert all(
        out[1][c]
        for c in out[1].asDict()
        if c.startswith("rule_")
    )
    assert not out[2]["rule_word_count"] and not out[2]["keep"]
    assert not out[3]["rule_symbol_ratio"]
    assert out[4]["bullet_line_frac"] == 1.0 and not out[4]["rule_bullet_lines"]
    assert not out[5]["rule_ellipsis_lines"]
    assert out[6]["alpha_word_frac"] < 0.8 and not out[6]["rule_alpha_words"]
    assert out[7]["stopword_hits"] < 2 and not out[7]["rule_stopwords"]


def test_gopher_rules_plan_pure_projection(spark):
    import contextlib
    import io

    from sparkcrawl.operators.repetition import gopher_quality_rules

    docs = spark.createDataFrame([(1, "the cat")], ["doc_id", "text"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        gopher_quality_rules(docs).explain("formatted")
    p = buf.getvalue()
    # per-row projection only: no shuffle, no generator, no Python
    assert "Exchange" not in p
    assert "Generate" not in p
    assert "EvalPython" not in p


def test_c4_quality_filters_verdicts(spark):
    """C4 rule verdicts on crafted docs: sentence floor, curly brace,
    bad phrase, javascript line, terminal-punct/long-line fractions."""
    from sparkcrawl.operators.repetition import c4_quality_filters

    rows = [
        (1, "One good sentence here. Another one follows. And a third."),
        (2, "Too few sentences."),
        (3, "Has sentences. Three of them. Yes. But also { code }."),
        (4, "Fine text. More text. End. Please read our privacy policy."),
        (5, "Good. Good. Good.\nEnable JavaScript to continue"),
        (6, "ends well.\nno punct line\nfive words make this long."),
    ]
    out = {r["id"]: r for r in c4_quality_filters(
        spark.createDataFrame(rows, ["doc_id", "text"])).collect()}
    assert out[1]["keep"] and out[1]["n_sentences"] == 3
    assert not out[2]["keep"]                      # 1 sentence < 3
    assert not out[3]["keep"] and out[3]["has_curly_brace"]
    assert not out[4]["keep"] and out[4]["has_bad_phrase"]
    assert not out[5]["keep"] and out[5]["has_javascript"]
    assert out[6]["terminal_punct_line_frac"] == round(2 / 3, 6)
    assert out[6]["long_line_frac"] == round(1 / 3, 6)


def test_compression_ratio(spark):
    """Repetitive text compresses far better than varied text; empty
    docs are safe; the kernel is one Arrow pass (ArrowEvalPython),
    never row-at-a-time Python."""
    import contextlib
    import io

    from sparkcrawl.operators.repetition import compression_ratio

    rows = [
        (1, "spam spam spam spam " * 50),
        (2, "the quick brown fox jumps over a lazy dog near riverbanks "
            "while seventeen jazzy wizards mix bold phlegm quivers"),
        (3, ""),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = compression_ratio(docs)
    got = {r["id"]: r for r in out.collect()}
    assert got[1]["n_bytes"] == 1000
    assert got[1]["ratio"] < 0.1 < got[2]["ratio"]
    assert got[3]["n_bytes"] == 0 and got[3]["ratio"] > 0  # clamped denom
    # deterministic across runs
    again = {r["id"]: r["ratio"] for r in compression_ratio(docs).collect()}
    assert again == {i: r["ratio"] for i, r in got.items()}
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("simple")
    p = buf.getvalue()
    assert "ArrowEvalPython" in p and "BatchEvalPython" not in p
