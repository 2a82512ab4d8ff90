"""Inverted index build + positional phrase search."""

import pytest

from sparkcrawl.operators import invindex


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the dog  saw THE cat"),          # double space + case fold
        (3, "cat cat cat"),
        (4, ""),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_token_positions(docs):
    got = {(r["id"], r["pos"]): r["tok"]
           for r in invindex.token_positions(docs).collect()}
    # empties from the double space removed BEFORE numbering
    assert got[(2, 0)] == "the" and got[(2, 1)] == "dog"
    assert got[(2, 2)] == "saw" and got[(2, 3)] == "the"
    assert (4, 0) not in got


def test_inverted_index(docs):
    idx = {r["term"]: r for r in invindex.inverted_index(docs).collect()}
    assert idx["cat"]["df"] == 3
    assert idx["cat"]["postings"] == [1, 2, 3]
    assert idx["cat"]["gaps"] == [1, 1, 1]        # delta-encoded
    assert idx["the"]["postings"] == [1, 2]
    assert idx["mat"]["postings"] == [1] and idx["mat"]["gaps"] == [1]


def test_df_cuts(docs):
    idx = {r["term"] for r in
           invindex.inverted_index(docs, min_df=2, max_df=2).collect()}
    assert "the" in idx          # df=2 kept
    assert "cat" not in idx      # df=3 > max_df: stopword cut
    assert "mat" not in idx      # df=1 < min_df


def test_phrase_search(docs):
    got = {r["id"]: r["n_matches"]
           for r in invindex.phrase_search(docs, ["the", "cat"]).collect()}
    assert got == {1: 1, 2: 1}   # case-folded match in doc 2
    # overlapping occurrences each count
    got2 = {r["id"]: r["n_matches"]
            for r in invindex.phrase_search(docs, ["cat", "cat"]).collect()}
    assert got2 == {3: 2}
    # three-term phrase
    got3 = {r["id"]: r["n_matches"]
            for r in invindex.phrase_search(
                docs, ["the", "cat", "sat"]).collect()}
    assert got3 == {1: 1}
    with pytest.raises(ValueError):
        invindex.phrase_search(docs, [])


def test_percolate(spark, docs):
    """Standing-query matching: 'all' needs every term, 'any' needs one;
    rule-side duplicates/case must not break 'all'; no-hit docs absent."""
    standing = spark.createDataFrame(
        [
            ("q_all", ["cat", "mat"], "all"),
            ("q_any", ["dog", "mat"], "any"),
            ("q_dup", ["CAT", "cat", "Sat"], "all"),  # normalizes to 2 terms
            ("q_none", ["zebra"], "any"),
        ],
        ["query_id", "terms", "mode"],
    )
    out = invindex.percolate(docs, standing)
    got = {(r["id"], r["query_id"]): (r["matched_terms"], r["n_terms"])
           for r in out.collect()}
    assert got[(1, "q_all")] == (2, 2)          # cat+mat both in doc 1
    assert (2, "q_all") not in got              # doc 2 lacks mat
    assert got[(1, "q_any")] == (1, 2)          # mat only
    assert got[(2, "q_any")] == (1, 2)          # dog only
    assert (3, "q_any") not in got              # doc 3: no dog, no mat
    assert got[(1, "q_dup")] == (2, 2)          # dup/case folded away
    assert all(q != "q_none" for (_, q) in got) # zebra hits nothing
    assert all(i != 4 for (i, _) in got)        # empty doc never matches
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p and "Cartesian" not in p
    assert "BatchEvalPython" not in p


def test_postings_size_estimate(spark):
    """Varint byte ladder is exact: gaps 1/127 -> 1 byte, 128 -> 2,
    16384 -> 3; raw = 8*df; savings follow."""
    rows = [
        ("dense", 4, [1, 2, 3, 4], [1, 1, 1, 1]),
        ("mixed", 3, [1, 129, 16513], [1, 128, 16384]),
    ]
    idx = spark.createDataFrame(
        rows, "term string, df int, postings array<bigint>, gaps array<bigint>")
    got = {r["term"]: r
           for r in invindex.postings_size_estimate(idx).collect()}
    assert got["dense"]["raw_bytes"] == 32
    assert got["dense"]["varint_bytes"] == 4
    assert got["dense"]["savings_frac"] == round(28 / 32, 6)
    assert got["mixed"]["raw_bytes"] == 24
    assert got["mixed"]["varint_bytes"] == 1 + 2 + 3
    # composes with the real index builder
    docs = spark.createDataFrame(
        [(i, "common word") for i in range(5)], ["doc_id", "text"])
    est = {r["term"]: r for r in invindex.postings_size_estimate(
        invindex.inverted_index(docs)).collect()}
    assert est["common"]["df"] == 5 and est["common"]["varint_bytes"] == 5
