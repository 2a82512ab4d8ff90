"""Training-data pipeline ops: dedup / minhash / simhash / text analysis."""

import pytest
from pyspark.sql import functions as F

from sparkcrawl.operators import textops


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the cat sat on the mat and looked at the dog"),
        (2, "the cat sat on the mat and looked at the dog"),      # exact dup of 1
        (3, "the cat sat on the mat and looked at the cat"),      # near dup of 1
        (4, "der hund und die katze sind nicht das problem"),     # german
        (5, "le chat et la souris dans les champs des fleurs"),   # french
        (6, "completely different content about spark engines!"),
        (7, ""),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup(docs):
    kept = {r["doc_id"] for r in textops.exact_dedup(docs).collect()}
    assert 1 in kept and 2 not in kept
    assert {3, 4, 5, 6, 7} <= kept


def test_duplicate_groups(docs):
    groups = textops.duplicate_groups(docs).collect()
    assert len(groups) == 1
    assert groups[0]["n_dups"] == 2 and groups[0]["keeper_id"] == 1


def test_ngram_jaccard_pairs(docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in textops.ngram_jaccard_pairs(docs, n=5, threshold=0.5).collect()}
    assert pairs[(1, 2)] == 1.0           # identical
    assert 0.5 <= pairs[(1, 3)] < 1.0     # near dup
    assert (1, 6) not in pairs


def test_prefix_filter_matches_bruteforce(docs):
    """Prefix filtering is exact: identical output to the quadratic
    shared-shingle join at the same (n, threshold)."""
    for t in (0.15, 0.5, 0.9):
        brute = {(r["id_a"], r["id_b"]): r["jaccard"]
                 for r in textops.ngram_jaccard_pairs(
                     docs, n=5, threshold=t).collect()}
        pref = {(r["id_a"], r["id_b"]): r["jaccard"]
                for r in textops.prefix_filter_jaccard_pairs(
                    docs, n=5, threshold=t).collect()}
        assert pref == brute, f"threshold {t}"


def test_prefix_filter_known_pairs(docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in textops.prefix_filter_jaccard_pairs(
                 docs, n=5, threshold=0.5).collect()}
    assert pairs[(1, 2)] == 1.0
    assert 0.5 <= pairs[(1, 3)] < 1.0
    assert (1, 6) not in pairs


def test_ngram_containment_asymmetry(spark):
    # doc 2 is a verbatim prefix of doc 1: every one of its 8-gram
    # shingles is contained in 1 (containment 1.0 that direction) while
    # the reverse direction — and Jaccard — stay small
    rows = [
        (1, "abcdefghijklmnopqrstuvwxyz"),
        (2, "abcdefghijklmno"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {(r["src_id"], r["dst_id"]): r["containment"]
           for r in textops.ngram_containment_pairs(docs, n=8, threshold=0.5).collect()}
    assert out[(2, 1)] == 1.0
    assert (1, 2) not in out          # 8/19 ~ 0.42 < 0.5
    # identical docs contain each other fully: both directions emitted
    rows2 = [(1, "spark shuffles on the key"), (2, "spark shuffles on the key")]
    docs2 = spark.createDataFrame(rows2, ["doc_id", "text"])
    out2 = {(r["src_id"], r["dst_id"]): r["containment"]
            for r in textops.ngram_containment_pairs(docs2, n=8, threshold=0.5).collect()}
    assert out2[(1, 2)] == 1.0 and out2[(2, 1)] == 1.0


def test_minhash_lsh_finds_near_dups(docs):
    cand = {(r["id_a"], r["id_b"]) for r in textops.minhash_lsh_pairs(docs, num_perms=8).collect()}
    assert (1, 2) in cand
    assert (1, 3) in cand


def test_dedup_against_index_bipartite(spark):
    from pyspark.sql import functions as SF

    indexed = spark.createDataFrame(
        [(1, "the cat sat on the mat and looked at the dog"),
         (2, "zzzz qqqq xxxx wwww vvvv uuuu tttt ssss")],
        ["doc_id", "text"],
    )
    incoming = spark.createDataFrame(
        [(10, "the cat sat on the mat and looked at the dog"),  # dup of 1
         (12, "the cat sat on the mat and looked at the dog"),  # dup of 1 AND 10
         (11, "jjjj kkkk llll mmmm nnnn oooo pppp rrrr")],       # unique
        ["doc_id", "text"],
    )
    sigs = textops.minhash_signatures(indexed, num_perms=8, n=5)
    out = {(r["new_id"], r["index_id"]): r["n_bands"]
           for r in textops.dedup_against_index(
               incoming, sigs, num_perms=8, n=5).collect()}
    # identical text -> every band agrees
    assert out[(10, 1)] == 8 and out[(12, 1)] == 8
    # strictly bipartite: the 10~12 intra-batch dup never appears
    assert not any(a in (10, 12) and b in (10, 12) for a, b in out)
    assert (11, 2) not in out
    # index-side bucket cap only removes candidates
    capped = {(r["new_id"], r["index_id"])
              for r in textops.dedup_against_index(
                  incoming, sigs, num_perms=8, n=5, max_bucket_size=0
              ).collect()}
    assert capped == set()
    # composition check: the verify stage on candidates confirms the dup
    cand = spark.createDataFrame(
        [(10, 1)], ["id_a", "id_b"]
    ).select(SF.col("id_a"), SF.col("id_b"))
    ver = textops.verify_jaccard_pairs(
        cand, incoming.unionByName(indexed), n=5, threshold=0.9
    ).collect()
    assert len(ver) == 1 and ver[0]["jaccard"] == 1.0


def test_minhash_agreement_reflects_similarity(docs):
    rows = {(r["id_a"], r["id_b"]): r["n_bands"]
            for r in textops.minhash_lsh_pairs(docs, num_perms=8).collect()}
    assert rows[(1, 2)] == 8              # identical docs agree on all perms
    assert rows.get((1, 3), 0) < 8 or rows[(1, 2)] >= rows[(1, 3)]


def test_minhash_and_or_banding(docs):
    """rows_per_band>1 (AND within band, OR across): candidates are a
    subset of the r=1 set, identical docs always survive (every band
    matches), and the sharper threshold prunes weaker pairs first."""
    r1 = {(r["id_a"], r["id_b"]): r["n_bands"]
          for r in textops.minhash_lsh_pairs(docs, num_perms=8).collect()}
    r4 = {(r["id_a"], r["id_b"]): r["n_bands"]
          for r in textops.minhash_lsh_pairs(
              docs, num_perms=8, rows_per_band=4).collect()}
    assert set(r4) <= set(r1)
    assert r4[(1, 2)] == 2          # identical docs match all 8/4 = 2 bands
    # each matched band implies its 4 perms all matched individually
    for pair, nb in r4.items():
        assert nb * 4 <= r1[pair]


def test_lsh_then_verify_two_phase(docs):
    """The corpus-scale shape: LSH candidates -> exact Jaccard verify.
    Verified output must equal the all-pairs reference restricted to
    the candidate set."""
    cand = textops.minhash_lsh_pairs(docs, num_perms=8, n=5)
    verified = {(r["id_a"], r["id_b"]): r["jaccard"]
                for r in textops.verify_jaccard_pairs(
                    cand, docs, n=5, threshold=0.5).collect()}
    allpairs = {(r["id_a"], r["id_b"]): r["jaccard"]
                for r in textops.ngram_jaccard_pairs(
                    docs, n=5, threshold=0.5).collect()}
    cand_set = {(r["id_a"], r["id_b"]) for r in cand.collect()}
    assert verified == {p: j for p, j in allpairs.items() if p in cand_set}
    assert verified[(1, 2)] == 1.0


def test_simhash_dups_share_hash(docs):
    sh = {r["id"]: r["simhash"] for r in textops.simhash(docs).collect()}
    assert sh[1] == sh[2]
    # near-dup within small hamming distance
    h = bin(int(sh[1]) ^ int(sh[3])).count("1")
    assert h <= 8


def test_simhash_near_pairs(docs):
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in textops.simhash_near_pairs(docs.filter("doc_id != 7"), max_hamming=8).collect()}
    assert pairs[(1, 2)] == 0
    assert (1, 3) in pairs


def test_language_id(docs):
    pred = {r["id"]: r["pred_lang"] for r in textops.language_id(docs).collect()}
    assert pred[1] == "en" and pred[4] == "de" and pred[5] == "fr"
    assert pred[7] == "unknown"


def test_quality_and_tokens(docs):
    q = {r["id"]: r for r in textops.quality_score(docs).collect()}
    assert q[1]["n_words"] == 11
    assert q[1]["stopword_ratio"] > q[6]["stopword_ratio"]
    t = {r["id"]: r for r in textops.token_counts(docs).collect()}
    assert t[1]["ws_tokens"] == 11
    assert t[6]["re_tokens"] == 7  # 6 words + '!'


def test_fingerprint_stable_under_suffix_edit(spark):
    rows = [(1, "abcdefghijklmnop the core content 123"),
            (2, "abcdefghijklmnop the core content 456")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    fp = {r["id"]: r["fingerprint"] for r in textops.doc_fingerprint(df, n=8).collect()}
    # min-shingle fingerprint usually survives a suffix edit; at minimum deterministic
    fp2 = {r["id"]: r["fingerprint"] for r in textops.doc_fingerprint(df, n=8).collect()}
    assert fp == fp2


def test_spans_to_text(spark):
    from sparkcrawl.schemas import DOCUMENTS_SCHEMA

    rows = [
        ("d1", [("text", "hello", "", 0), ("media", "", "http://x/i.png", 1),
                ("text", "world", "", 2)]),
    ]
    df = spark.createDataFrame(rows, DOCUMENTS_SCHEMA)
    out = textops.spans_to_text(df).collect()
    assert out[0]["text"] == "hello world"


# --------------------------------------------------------------------------
# connected components + end-to-end canonical dedup
# --------------------------------------------------------------------------

def _cc(spark, edges):
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    return {r["id"]: r["comp"]
            for r in textops.connected_components(df).collect()}


def test_cc_chain_star_disjoint(spark):
    # chain 1-2-3-4, star 10-(11,12,13), disjoint pair 20-21
    comp = _cc(spark, [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (10, 13),
                       (20, 21)])
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1,
                    10: 10, 11: 10, 12: 10, 13: 10,
                    20: 20, 21: 20}


def test_cc_merges_through_bridge(spark):
    # two cliques joined by one bridge edge -> single component, min id wins
    comp = _cc(spark, [(5, 6), (6, 7), (30, 31), (31, 32), (7, 30)])
    assert set(comp.values()) == {5}


def test_cc_duplicate_and_reversed_edges(spark):
    comp = _cc(spark, [(2, 1), (1, 2), (2, 1), (3, 2)])
    assert comp == {1: 1, 2: 1, 3: 1}


def test_cc_high_diameter_path_converges(spark):
    # a 12-node path is far beyond any LSH clique diameter; min-label
    # propagation still closes it within max_iters
    edges = [(i, i + 1) for i in range(100, 111)]
    comp = _cc(spark, edges)
    assert set(comp.values()) == {100} and len(comp) == 12


def test_dedup_corpus_canonical(spark):
    rows = [
        (1, "the cat sat on the mat and looked at the dog today"),
        (2, "the cat sat on the mat and looked at the dog today"),   # dup of 1
        (3, "the cat sat on the mat and looked at the dog tonight"), # near 1/2
        (6, "completely different content about spark engines ok"),
        (7, "another unrelated document with its own words here"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    kept = {r["doc_id"] for r in textops.dedup_corpus_canonical(
        docs, num_perms=8, n=5, threshold=0.5).collect()}
    # transitive cluster {1,2,3} -> canonical 1; singletons survive
    assert kept == {1, 6, 7}


def test_soft_dedup_weights(spark):
    rows = [
        (1, "the cat sat on the mat and looked at the dog today"),
        (2, "the cat sat on the mat and looked at the dog today"),   # dup of 1
        (3, "the cat sat on the mat and looked at the dog tonight"), # near 1/2
        (6, "completely different content about spark engines ok"),
        (7, "another unrelated document with its own words here"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: (r["cluster_size"], r["weight"])
           for r in textops.soft_dedup_weights(
               docs, alpha=1.0, num_perms=8, n=5, threshold=0.5).collect()}
    # every doc kept; the transitive cluster is downweighted to 1/3 each
    assert set(got) == {1, 2, 3, 6, 7}
    assert got[1] == (3, round(1 / 3, 6)) == got[2] == got[3]
    assert got[6] == (1, 1.0) and got[7] == (1, 1.0)
    # alpha=0.5 temper: weight = size^-0.5
    got05 = {r["doc_id"]: r["weight"]
             for r in textops.soft_dedup_weights(
                 docs, alpha=0.5, num_perms=8, n=5, threshold=0.5).collect()}
    assert got05[1] == round(3 ** -0.5, 6) and got05[6] == 1.0


# --------------------------------------------------------------------------
# TF-IDF / BM25
# --------------------------------------------------------------------------

def test_tfidf_top_terms(spark):
    import math

    rows = [
        (1, "spark spark join"),
        (2, "join window"),
        (3, "window window window table"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {(r["id"], r["rank"]): (r["tok"], r["tfidf"])
           for r in textops.tfidf_top_terms(docs, k=2).collect()}
    # doc 1: 'spark' tf=2, df=1 -> 2*(ln(4/2)+1); 'join' tf=1, df=2
    assert out[(1, 1)][0] == "spark"
    assert out[(1, 1)][1] == pytest.approx(2 * (math.log(4 / 2) + 1), abs=1e-6)
    # doc 3: 'window' dominates; 'table' (df=1, rarer) beats nothing else
    assert out[(3, 1)][0] == "window"
    assert out[(3, 2)][0] == "table"


def test_bm25_scores(spark):
    import math

    rows = [
        (1, "spark join table"),
        (2, "table scan row"),
        (3, "spark spark spark"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["id"]: r["bm25"]
           for r in textops.bm25_scores(docs, ("spark",)).collect()}
    # doc 2 has no query term -> exactly 0; corpus-cardinality output
    assert set(out) == {1, 2, 3}
    assert out[2] == 0.0
    # tf saturation: doc 3 (tf=3) > doc 1 (tf=1), but < 3x doc 1
    idf = math.log((3 - 2 + 0.5) / (2 + 0.5) + 1)
    k1, b = 1.2, 0.75
    s1 = idf * 1 * (k1 + 1) / (1 + k1 * (1 - b + b * 3 / 3.0))
    assert out[1] == pytest.approx(s1, abs=1e-6)
    assert out[1] < out[3] < 3 * out[1]


def test_trigram_lm_scores(spark):
    import math

    # two fluent docs sharing patterns + one garbage doc: the garbage
    # doc must score lower (higher ppl) under the corpus model
    rows = [
        (1, "the cat sat"),
        (2, "the cat ran"),
        (3, "zqxj vwkp"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["id"]: r for r in textops.trigram_lm_scores(docs).collect()}
    assert set(out) == {1, 2, 3}
    # train == docs: nothing is OOV
    assert all(out[i]["oov_ratio"] == 0.0 for i in out)
    # " the cat " trigram mass is shared -> docs 1/2 beat the garbage doc
    assert out[1]["avg_logp"] > out[3]["avg_logp"]
    assert out[1]["ppl"] < out[3]["ppl"]
    # hand-check doc counts: padded len 13 -> 11 trigrams
    assert out[1]["n_trigrams"] == 11
    # scoring against a SEPARATE train corpus marks unseen trigrams OOV
    train = spark.createDataFrame([(10, "the cat sat")], ["doc_id", "text"])
    out2 = {r["id"]: r
            for r in textops.trigram_lm_scores(docs, train=train).collect()}
    assert out2[1]["oov_ratio"] == 0.0
    assert out2[3]["oov_ratio"] == 1.0
    assert out2[3]["avg_logp"] is None  # nothing in-model -> no score


def test_perplexity_buckets_terciles(spark):
    # three docs, one language, distinct ppl: with n=3 the 1/3 and 2/3
    # interpolated cuts fall strictly between consecutive values, so
    # ppl rank order IS the bucket assignment
    rows = [
        (1, "the cat sat", "en"),
        (2, "the cat ran", "en"),
        (3, "zqxj vwkp", "en"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    ppl = {r["id"]: r["ppl"] for r in textops.trigram_lm_scores(docs).collect()}
    assert len(set(ppl.values())) == 3  # fixture precondition
    order = sorted(ppl, key=ppl.get)
    out = {r["id"]: r["bucket"]
           for r in textops.perplexity_buckets(docs).collect()}
    assert out[order[0]] == "head"
    assert out[order[1]] == "middle"
    assert out[order[2]] == "tail"


def test_perplexity_buckets_null_ppl_is_tail(spark):
    # scored against a SEPARATE train corpus: a doc with zero in-model
    # trigrams has NULL ppl — "nothing like the reference corpus" = tail
    docs = spark.createDataFrame(
        [(1, "the cat sat", "en"), (2, "zqxj vwkp", "en")],
        ["doc_id", "text", "lang"],
    )
    train = spark.createDataFrame([(10, "the cat sat")], ["doc_id", "text"])
    out = {r["id"]: r for r in
           textops.perplexity_buckets(docs, train=train).collect()}
    assert out[2]["ppl"] is None
    assert out[2]["bucket"] == "tail"


def test_perplexity_buckets_plan_no_window(spark):
    import contextlib
    import io

    docs = spark.createDataFrame(
        [(1, "the cat sat", "en")], ["doc_id", "text", "lang"]
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        textops.perplexity_buckets(docs).explain("formatted")
    # the cuts are a per-language hash agg broadcast back — a
    # percent_rank formulation would sort the whole corpus per language
    assert "Window" not in buf.getvalue()


def test_redact_pii(spark):
    rows = [
        (1, "mail bob.smith+x@corp.example.com now"),
        (2, "call +1 555-010-9999 or 555 010 8888 today"),
        (3, "server at 10.0.37.99 port 80"),
        (4, "clean text nothing here"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["id"]: r for r in textops.redact_pii(docs).collect()}
    assert out[1]["n_email"] == 1
    assert "<EMAIL>" in out[1]["redacted"]
    assert "@" not in out[1]["redacted"]
    assert out[2]["n_phone"] == 2
    assert out[2]["redacted"] == "call <PHONE> or <PHONE> today"
    assert out[3]["n_ipv4"] == 1
    assert out[3]["redacted"] == "server at <IPV4> port 80"
    assert out[4]["redacted"] == rows[3][1]
    assert (out[4]["n_email"], out[4]["n_phone"], out[4]["n_ipv4"]) == (0, 0, 0)


def test_cross_corpus_contamination(spark):
    from sparkcrawl.operators.textops import cross_corpus_contamination

    train = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "pack my box with five dozen liquor jugs"),
         (3, "totally unrelated content about spark engines")],
        ["doc_id", "text"],
    )
    probe = spark.createDataFrame(
        [(101, "the quick brown fox jumps over the lazy dog"),   # verbatim leak
         (102, "the quick brown fox jumps over a lazy dog"),     # near-dup leak
         (103, "completely novel evaluation item wording")],
        ["doc_id", "text"],
    )
    hits = {
        (r["probe_id"], r["train_id"]): r["jaccard"]
        for r in cross_corpus_contamination(train, probe, n=5, threshold=0.4).collect()
    }
    assert hits[(101, 1)] == 1.0          # exact leak detected
    assert 0.4 <= hits[(102, 1)] < 1.0    # near-dup leak detected
    assert not any(p == 103 for p, _ in hits)   # clean item stays clean
    assert not any(t in (2, 3) for _, t in hits)


def test_duplicated_substring_spans(spark):
    """Maximal duplicated token spans: cross-doc share, '$'-free exact
    window merge (overlap AND adjacency), internal repeats, no-dup doc."""
    from sparkcrawl.operators.textops import (
        duplicated_substring_spans,
        substring_dup_stats,
    )

    docs = spark.createDataFrame(
        [
            ("A", "a b c d e f g h i j"),          # shares a-h with B
            ("B", "x y a b c d e f g h q r"),
            ("C", "p q r s t u v w p q r s t u v w"),  # internal repeat
            ("D", "solo words only here"),          # clean (and < k tokens)
        ],
        ["doc_id", "text"],
    )
    spans = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
        for r in duplicated_substring_spans(docs, k=8).collect()
    }
    # A[1..8] == B[3..10]; C's two 8-windows at pos 1 and 9 are exactly
    # adjacent so they merge into ONE maximal span covering the doc.
    assert spans == {("A", 1, 8, 8), ("B", 3, 10, 8), ("C", 1, 16, 16)}

    stats = {
        r["doc_id"]: (r["n_tokens"], r["dup_tokens"], r["dup_frac"])
        for r in substring_dup_stats(docs, k=8).collect()
    }
    assert stats["A"] == (10, 8, 0.8)
    assert stats["C"] == (16, 16, 1.0)
    assert stats["D"] == (4, 0, 0.0)


def test_cut_token_spans(spark):
    """Applying spans removes exactly the covered tokens; span-less
    docs pass through byte-identical; fully-covered docs empty out."""
    from sparkcrawl.operators.textops import (
        cut_token_spans,
        duplicated_substring_spans,
    )

    docs = spark.createDataFrame(
        [
            ("A", "a b c d e f g h i j"),
            ("B", "x y a b c d e f g h q r"),
            ("C", "p q r s t u v w p q r s t u v w"),
            ("D", "solo words only here"),
        ],
        ["doc_id", "text"],
    )
    spans = duplicated_substring_spans(docs, k=8)
    out = {
        r["doc_id"]: (r["text"], r["removed_tokens"])
        for r in cut_token_spans(docs, spans).collect()
    }
    assert out == {
        "A": ("i j", 8),
        "B": ("x y q r", 8),
        "C": ("", 16),
        "D": ("solo words only here", 0),
    }


def test_signature_index_incremental_pipeline(spark, tmp_path):
    """Continuous-crawl dedup end-to-end with the PERSISTED index:
    ingest batch A (signatures stored) -> batch B dedups against the
    store and appends its own -> batch C sees BOTH; a replayed append
    (same batch id) replaces instead of duplicating."""
    from sparkcrawl.sources.store import SignatureIndexTable

    idx = SignatureIndexTable(str(tmp_path))
    a = spark.createDataFrame(
        [(1, "the cat sat on the mat and looked at the dog")],
        ["doc_id", "text"],
    )
    b = spark.createDataFrame(
        [(10, "the cat sat on the mat and looked at the dog"),  # dup of 1
         (11, "qqqq wwww eeee rrrr tttt yyyy uuuu iiii")],
        ["doc_id", "text"],
    )
    c = spark.createDataFrame(
        [(20, "qqqq wwww eeee rrrr tttt yyyy uuuu iiii")],      # dup of 11
        ["doc_id", "text"],
    )
    idx.append(textops.minhash_signatures(a, 8, 5), batch_id="a")
    hits_b = {(r["new_id"], r["index_id"])
              for r in textops.dedup_against_index(
                  b, idx.read(spark), 8, 5).collect()}
    assert hits_b == {(10, 1)}
    idx.append(textops.minhash_signatures(b, 8, 5), batch_id="b")
    hits_c = {(r["new_id"], r["index_id"])
              for r in textops.dedup_against_index(
                  c, idx.read(spark), 8, 5).collect()}
    assert (20, 11) in hits_c and (20, 1) not in hits_c
    # replay-idempotent: re-appending batch b replaces its delta
    n_before = idx.read(spark).count()
    idx.append(textops.minhash_signatures(b, 8, 5), batch_id="b")
    assert idx.read(spark).count() == n_before


def test_normalize_text_unicode_and_whitespace(spark):
    rows = [
        (1, "café au lait"),        # decomposed -> NFC precomposed
        (2, "a b c"),           # NBSP + em-space -> plain spaces
        (3, "x\x07y\x00z"),               # control chars dropped
        (4, "line1\r\nline2\t end  "),    # CRLF/tab/trailing -> collapsed
        (5, "already clean"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["id"]: r for r in textops.normalize_text(docs).collect()}
    assert out[1]["norm_text"] == "café au lait" and out[1]["changed"]
    assert out[2]["norm_text"] == "a b c" and out[2]["changed"]
    assert out[3]["norm_text"] == "xyz" and out[3]["changed"]
    assert out[4]["norm_text"] == "line1 line2 end" and out[4]["changed"]
    assert out[5]["norm_text"] == "already clean" and not out[5]["changed"]
    # idempotent: normalizing the output changes nothing
    again = textops.normalize_text(
        spark.createDataFrame(
            [(i, r["norm_text"]) for i, r in out.items()], ["doc_id", "text"]
        )
    )
    assert all(not r["changed"] for r in again.collect())


def test_normalize_text_plan_one_arrow_pass(spark):
    import contextlib
    import io

    docs = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        textops.normalize_text(docs).explain("simple")
    p = buf.getvalue()
    # NFC is the only Python step: ONE ArrowEvalPython, the regex
    # stages are codegen'd on top — and nothing shuffles
    assert p.count("ArrowEvalPython") == 1, p
    assert "Exchange" not in p
    assert "BatchEvalPython" not in p


def test_paragraph_dedup_first_wins_and_order(spark):
    """Corpus-wide paragraph dedup: the FIRST (lowest doc id, lowest
    index) occurrence survives, later copies are cut, surviving
    paragraphs keep original order, and a doc made entirely of losers
    comes back as ''."""
    from sparkcrawl.operators.textops import paragraph_dedup

    rows = [
        (1, "alpha one\n\nshared block\n\nbeta two"),
        (2, "shared block\n\ngamma three"),   # loses 'shared block' to doc 1
        (3, "shared block"),                  # loses everything
        (4, "delta four\n\n\n\ndelta four"),  # self-dup: keep first, cut second
    ]
    out = {
        r["id"]: r["text"]
        for r in paragraph_dedup(spark.createDataFrame(rows, ["doc_id", "text"])).collect()
    }
    assert out == {
        1: "alpha one\n\nshared block\n\nbeta two",
        2: "gamma three",
        3: "",
        4: "delta four",
    }


def test_paragraph_dedup_plan_no_corpus_window(spark):
    """The first-wins rule must be a min hash-agg (map-side combine),
    never a corpus-wide window sort."""
    import contextlib
    import io

    from sparkcrawl.operators.textops import paragraph_dedup

    docs = spark.createDataFrame([(1, "a\n\nb")], ["doc_id", "text"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        paragraph_dedup(docs).explain("simple")
    p = buf.getvalue()
    assert "Window" not in p
    assert "HashAggregate" in p or "ObjectHashAggregate" in p
    assert "BatchEvalPython" not in p


def test_hashed_bow_and_linear_classifier(spark):
    """Hashing-trick features + broadcast linear scoring: tf counts per
    md5 bucket, sigmoid of the weighted sum, bias-only fallback for a
    doc whose buckets all miss the weight table."""
    import math

    from sparkcrawl.functions.hashing import md5_bucket
    from sparkcrawl.operators.textops import hashed_bow, linear_text_classifier

    docs = spark.createDataFrame(
        [(1, "spark spark join"), (2, "window")], ["doc_id", "text"]
    )
    feats = {(r["id"], r["bucket"]): r["tf"] for r in hashed_bow(docs, dim=16).collect()}
    b = {
        r["t"]: r["b"]
        for r in spark.createDataFrame([("spark",), ("join",), ("window",)], ["t"])
        .select("t", md5_bucket(F.col("t"), 16).alias("b"))
        .collect()
    }
    assert feats[(1, b["spark"])] == 2 + (2 if b["spark"] == b["join"] else 0)
    assert feats[(2, b["window"])] == 1

    # weights hit doc 1's buckets only -> doc 2 scores sigmoid(bias)
    weights = spark.createDataFrame(
        [(b["spark"], 0.5), (b["join"], -0.25)], ["bucket", "weight"]
    )
    if b["window"] in (b["spark"], b["join"]):  # md5-bucket collision guard
        weights = weights.filter(F.col("bucket") != b["window"])
    out = {
        r["id"]: r
        for r in linear_text_classifier(docs, weights, dim=16, bias=0.1).collect()
    }
    z1 = 0.1 + 2 * 0.5 + 1 * -0.25
    assert out[1]["score"] == round(1 / (1 + math.exp(-z1)), 6)
    assert out[1]["label"]
    if b["window"] not in (b["spark"], b["join"]):
        assert out[2]["score"] == round(1 / (1 + math.exp(-0.1)), 6)


def test_contaminated_spans_surgical_cut(spark):
    """Positional decontamination: a train doc quoting an eval item
    verbatim reports exactly the quoted span (not the whole doc), the
    span feeds cut_token_spans, and clean docs report nothing. k=4."""
    from sparkcrawl.operators.textops import contaminated_spans, cut_token_spans

    eval_item = "the secret eval question with answer"
    train = spark.createDataFrame(
        [
            (1, "intro words here " + eval_item + " outro trailing text"),
            (2, "completely unrelated training document text here"),
        ],
        ["doc_id", "text"],
    )
    probe = spark.createDataFrame([(100, eval_item)], ["doc_id", "text"])
    spans = contaminated_spans(train, probe, k=4).collect()
    assert len(spans) == 1
    sp = spans[0]
    # eval item = tokens 4..9 (1-based) of doc 1
    assert (sp["doc_id"], sp["span_start"], sp["span_end"], sp["span_tokens"]) == (
        1, 4, 9, 6,
    )
    cut = {
        r["doc_id"]: r["text"]
        for r in cut_token_spans(
            train,
            spark.createDataFrame(spans).select("doc_id", "span_start", "span_end"),
        ).collect()
    }
    assert cut[1] == "intro words here outro trailing text"
    assert cut[2] == "completely unrelated training document text here"


def test_dsir_weights_favor_target_like_docs(spark):
    """DSIR sanity: target = en docs => mean logw of en docs must
    exceed mean logw of zh docs (disjoint token distributions in the
    fixture), and token-free docs score exactly 0."""
    from pyspark.sql import functions as F

    from sparkcrawl.operators.importance import (
        dsir_log_weights,
        gumbel_topk_sample,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    raw = docs.select("doc_id", "text")
    lw = dsir_log_weights(
        raw, docs.filter(F.col("lang") == "en").select("doc_id", "text"),
        dim=1024,
    )
    joined = lw.join(
        docs.select(F.col("doc_id").alias("id"), "lang"), "id"
    ).groupBy("lang").agg(F.avg("logw").alias("m"))
    means = {r["lang"]: r["m"] for r in joined.collect()}
    assert means["en"] > means["zh"], means

    empty = spark.createDataFrame([(999999, "")], ["doc_id", "text"])
    z = dsir_log_weights(raw.unionByName(empty), empty, dim=1024)
    assert z.filter("id = 999999").first()["logw"] == 0.0

    s1 = sorted(r["id"] for r in gumbel_topk_sample(lw, k=10).collect())
    s2 = sorted(r["id"] for r in gumbel_topk_sample(lw, k=10).collect())
    assert s1 == s2 and len(s1) == 10


def test_winnowing_guarantee_and_tie_rule(spark):
    """Winnowing guarantee: docs sharing a substring of length >=
    w+k-1 share a fingerprint hash. Tie rule: a run of identical
    k-grams selects the RIGHTMOST position of every full window."""
    shared = "QUOTEDSENTENCE"  # 14 chars >= 4+8-1
    rows = [
        (1, "left padding text " + shared + " tail one"),
        (2, "other document entirely, then " + shared + " end"),
        (3, "no overlap with anything here at all"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    fp = textops.winnowing_fingerprints(docs, k=8, w=4)
    by_doc = {}
    for r in fp.collect():
        by_doc.setdefault(r["id"], set()).add(r["fp_hash"])
    assert by_doc[1] & by_doc[2]  # the guarantee
    # tie rule: 'a'*15 -> 8 identical grams, full windows at pos 3..7,
    # rightmost-min == window end each time
    mono = spark.createDataFrame([(9, "a" * 15)], ["doc_id", "text"])
    sel = textops.winnowing_fingerprints(mono, k=8, w=4).collect()
    assert sorted(r["fp_pos"] for r in sel) == [3, 4, 5, 6, 7]
    assert len({r["fp_hash"] for r in sel}) == 1


def test_winnowing_samples_strictly_fewer_positions(docs):
    """Density: selected fingerprints are a strict subset of all
    k-gram positions (~2/(w+1)), and identical docs fingerprint
    identically."""
    fp = textops.winnowing_fingerprints(docs, k=5, w=4)
    n_fp = fp.count()
    n_grams = textops.char_shingles(docs, 5).count()
    assert 0 < n_fp < n_grams
    by_doc = {}
    for r in fp.collect():
        by_doc.setdefault(r["id"], set()).add((r["fp_pos"], r["fp_hash"]))
    assert by_doc[1] == by_doc[2]  # docs 1 and 2 are exact dups


def test_winnowing_pairs_thresholds(docs):
    pairs = {(r["id_a"], r["id_b"]): r["shared_fps"]
             for r in textops.winnowing_pairs(docs, k=5, w=4,
                                              min_shared=2).collect()}
    assert (1, 2) in pairs  # exact dups share everything
    assert all(v >= 2 for v in pairs.values())


def test_winnowing_max_postings_drops_boilerplate(spark):
    """A fingerprint hash shared by MORE than max_postings docs is
    excluded from pairing; rare fingerprints still pair."""
    # four EXACT copies: selection is identical, every hash has df=4
    rows = [(i, "boilerplate footer repeated on every page") for i in range(1, 5)]
    rows += [(10, "copy pair alpha beta gamma delta"),
             (11, "copy pair alpha beta gamma delta")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    uncapped = {(r["id_a"], r["id_b"])
                for r in textops.winnowing_pairs(
                    docs, k=8, w=4, min_shared=1).collect()}
    capped = {(r["id_a"], r["id_b"])
              for r in textops.winnowing_pairs(
                  docs, k=8, w=4, min_shared=1, max_postings=3).collect()}
    # the df=4 boilerplate family (4 docs > cap 3) disappears entirely;
    # the df=2 true dup stays
    assert (10, 11) in uncapped and (10, 11) in capped
    assert any(a < 5 and b < 5 for a, b in uncapped)
    assert not any(a < 5 and b < 5 for a, b in capped)


def test_cdc_chunks_tile_documents_exactly(spark):
    """Chunks are a contiguous 1-based cover: starts begin at 1,
    lengths sum to the doc length, no gaps or overlaps."""
    rows = [(1, "the quick brown fox jumps over the lazy dog " * 5),
            (2, "short"), (3, "")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    ch = textops.cdc_chunks(docs, k=8, divisor=16)
    by_doc = {}
    for r in ch.collect():
        by_doc.setdefault(r["id"], []).append((r["start"], r["length"]))
    for did, spans in by_doc.items():
        spans.sort()
        assert spans[0][0] == 1
        for (s1, l1), (s2, _) in zip(spans, spans[1:]):
            assert s2 == s1 + l1  # contiguous
        total = sum(l for _, l in spans)
        assert total == len(dict(rows)[did])
    assert 3 not in by_doc  # empty doc -> no chunks
    assert by_doc[2] == [(1, 5)]  # too short for any boundary


def test_cdc_boundaries_resync_after_prefix_edit(spark):
    """The CDC property: prepending bytes only rewrites the first
    chunk(s); boundaries re-synchronize and later chunks dedup."""
    base = "the quick brown fox jumps over the lazy dog " * 8
    docs = spark.createDataFrame(
        [(1, base), (2, "EDITED-PREFIX-" + base)], ["doc_id", "text"])
    ch = textops.cdc_chunks(docs, k=8, divisor=16)
    digs = {}
    for r in ch.collect():
        digs.setdefault(r["id"], set()).add(r["chunk_md5"])
    shared = digs[1] & digs[2]
    assert len(shared) >= len(digs[1]) * 0.6  # most chunks re-align


def test_cdc_duplicate_chunks_rollup(spark):
    docs = spark.createDataFrame(
        [(1, "identical page body " * 10), (2, "identical page body " * 10),
         (3, "something else entirely unrelated")],
        ["doc_id", "text"])
    dup = textops.cdc_duplicate_chunks(docs, k=8, divisor=16)
    rows = dup.collect()
    assert rows and all(r["n_copies"] >= 2 and r["n_docs"] >= 2 for r in rows)


def test_quality_top_fraction_threshold_then_filter(spark):
    """Per-stratum gate keeps exactly the docs at/above the stratum's
    (1-frac) quality percentile; kept share >= frac (ties kept)."""
    from sparkcrawl.operators.textops import quality_score, quality_top_fraction

    rows = []
    for i in range(20):
        # vary word count so the composite quality spreads
        rows.append((i, "the and is " * (i + 1), "en"))
    for i in range(20, 30):
        rows.append((i, "word " * (2 * i), "de"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    kept = quality_top_fraction(docs, frac=0.3, strata_col="lang").collect()
    q = {r.id: r.quality for r in quality_score(docs).collect()}
    langs = {i: ("en" if i < 20 else "de") for i in range(30)}
    import math

    for lang, n in (("en", 20), ("de", 10)):
        vals = sorted(q[i] for i in range(30) if langs[i] == lang)
        # exact linear-interpolation percentile at 1-frac
        pos = (1.0 - 0.3) * (n - 1)
        lo, hi = vals[math.floor(pos)], vals[math.ceil(pos)]
        thr = lo + (hi - lo) * (pos - math.floor(pos))
        expect = {i for i in range(30) if langs[i] == lang and q[i] >= thr}
        got = {r.id for r in kept if r.stratum == lang}
        assert got == expect, lang
        assert len(got) >= math.floor(0.3 * n)


def test_paragraph_language_segmentation(spark):
    en = "the cat and the dog of value"
    de = "der hund und die katze nicht da"
    fr = "le chat et la souris des champs"
    rows = [
        (1, f"{en}\n\n{de}\n\n{en} to in"),   # en majority, 1/3 minority
        (2, f"{de}\n\n{fr}"),                  # tie 1-1 -> de (lang asc)
        (3, "zzz qqq"),                        # no stopword hits
        (4, ""),                               # no paragraphs
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    pl = {(r["id"], r["idx"]): r["para_lang"]
          for r in textops.paragraph_languages(docs).collect()}
    assert pl[(1, 0)] == "en" and pl[(1, 1)] == "de" and pl[(1, 2)] == "en"
    assert pl[(3, 0)] == "unknown"
    assert not any(i == 4 for i, _ in pl)

    st = {r["id"]: r for r in textops.language_segment_stats(docs).collect()}
    assert st[1]["majority_lang"] == "en" and st[1]["n_paragraphs"] == 3
    assert st[1]["majority_cnt"] == 2
    assert st[1]["minority_share"] == round(1 / 3, 6)
    assert st[2]["majority_lang"] == "de"      # tie -> lang asc
    assert st[3]["majority_lang"] == "unknown"
    assert 4 not in st

    kept = {r["id"]: r["text"]
            for r in textops.keep_majority_language(docs).collect()}
    assert kept[1] == f"{en}\n\n{en} to in"    # German paragraph stripped
    assert kept[2] == de                        # tie keeps only de
    assert kept[4] == ""


def test_lsh_pr_eval(spark):
    """PR numbers recomputed from the library's own stages; recall on
    exact duplicates is 1.0 at every threshold (identical docs always
    collide on every band)."""
    rows = [
        (1, "the cat sat on the mat and looked at the dog today"),
        (2, "the cat sat on the mat and looked at the dog today"),
        (3, "the cat sat on the mat and looked at the dog tonight"),
        (6, "completely different content about spark engines ok"),
        (7, "another unrelated document with its own words here"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    kw = dict(num_perms=8, n=5, max_bucket_size=100, rows_per_band=1)
    out = {r["threshold"]: r for r in textops.lsh_pr_eval(
        docs, thresholds=(0.5, 0.99), **kw).collect()}

    cand = textops.minhash_lsh_pairs(docs, **kw)
    cand_j = {(r["id_a"], r["id_b"]): r["jaccard"]
              for r in textops.verify_jaccard_pairs(
                  cand, docs, n=5, threshold=0.0).collect()}
    truth = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in textops.prefix_filter_jaccard_pairs(
                 docs, n=5, threshold=0.5).collect()}
    for t in (0.5, 0.99):
        n_hit = sum(1 for j in cand_j.values() if j >= t)
        n_truth = sum(1 for j in truth.values() if j >= t)
        r = out[t]
        assert (r["n_candidates"], r["n_truth"], r["n_hit"]) == \
            (len(cand_j), n_truth, n_hit)
        assert r["recall"] == round(n_hit / max(n_truth, 1), 6)
        assert r["precision"] == round(n_hit / max(len(cand_j), 1), 6)
    # the exact-dup pair is found: recall at 0.99 is 1.0
    assert out[0.99]["recall"] == 1.0


def test_vocabulary_growth(spark):
    """Heaps-curve hand case: first-shard attribution of new terms,
    running sums, empty-shard-safe; token explode stays JVM-side."""
    import contextlib
    import io

    from sparkcrawl.operators.textops import vocabulary_growth

    docs = spark.createDataFrame(
        [(0, "a b a"), (1, "b c"), (2, "c d  d")],
        "doc_id long, text string")
    out = vocabulary_growth(docs, n_shards=2)
    got = {r["shard"]: r for r in out.collect()}
    # shard 0 = docs 0,2 (6 tokens; a,b,c,d all first seen there);
    # shard 1 = doc 1 (2 tokens; b,c already seen in shard 0)
    assert (got[0]["shard_tokens"], got[0]["new_terms"]) == (6, 4)
    assert (got[1]["shard_tokens"], got[1]["new_terms"]) == (2, 0)
    assert (got[1]["cum_tokens"], got[1]["cum_vocab"]) == (8, 4)

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("simple")
    assert "BatchEvalPython" not in buf.getvalue()


def test_mirror_canonicalize(spark):
    """Chained mirror pairs elect ONE canonical per family (min host);
    frontier rows rewrite host-only (path/query preserved), unmapped
    rows pass through NULL-canonical; the frontier-side join is a
    broadcast."""
    import contextlib
    import io

    from sparkcrawl.operators.mirrors import mirror_canonicalize

    pairs = spark.createDataFrame(
        [("b.example", "c.example"), ("a.example", "b.example")],
        "host_a string, host_b string")
    urls = spark.createDataFrame(
        [("http://c.example/x?q=1",),
         ("http://b.example/y",),
         ("http://a.example/z",),
         ("http://other.example/w",)],
        "url string")
    out = mirror_canonicalize(urls, pairs)
    got = {r["url"]: r for r in out.collect()}
    c = got["http://c.example/x?q=1"]
    assert (c["canonical_host"], c["canonical_url"], c["rewritten"]) == (
        "a.example", "http://a.example/x?q=1", True)
    b = got["http://b.example/y"]
    assert (b["canonical_host"], b["canonical_url"]) == (
        "a.example", "http://a.example/y")
    # the elected canonical itself and unmapped hosts pass through
    a = got["http://a.example/z"]
    assert (a["canonical_host"], a["canonical_url"], a["rewritten"]) == (
        None, "http://a.example/z", False)
    o = got["http://other.example/w"]
    assert (o["canonical_host"], o["rewritten"]) == (None, False)

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("simple")
    p = buf.getvalue()
    assert "BroadcastHashJoin" in p
    assert "BatchEvalPython" not in p


def test_zipf_fit_exact_power_law(spark):
    """f(r) = 12/r is exactly Zipfian: slope -1, r2 = 1, intercept
    ln 12 — hand-checkable because ln f is exactly linear in ln r."""
    import math

    toks = ["a"] * 12 + ["b"] * 6 + ["c"] * 4 + ["d"] * 3
    df = spark.createDataFrame([(1, " ".join(toks))], ["doc_id", "text"])
    row = textops.zipf_fit(df, top_n=4).collect()[0]
    assert row["n_terms"] == 4
    assert row["slope"] == -1.0
    assert row["r2"] == 1.0
    assert row["intercept"] == round(math.log(12.0), 6)
    assert row["top_share"] == 1.0


def test_zipf_fit_head_cap_and_ties(spark):
    """top_n caps the head (top_share < 1); equal-frequency terms rank
    by term asc so the fit is deterministic; flat frequencies give
    slope 0."""
    # 4 terms all freq 2 -> perfectly flat head
    df = spark.createDataFrame(
        [(1, "x x y y z z w w")], ["doc_id", "text"])
    row = textops.zipf_fit(df, top_n=2).collect()[0]
    assert row["n_terms"] == 2
    assert row["slope"] == 0.0
    assert row["top_share"] == 0.5          # 4 of 8 tokens in the head
    plan = textops.zipf_fit(df, top_n=2)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # heap top-k, no global sort
    assert "BatchEvalPython" not in plan


def test_term_bursts(spark):
    """A term absent in round 1 and dominant in round 2 tops round 2's
    burst ranking; steady terms score ~1; rate normalization keeps a
    2x-bigger round from bursting everything."""
    r1 = [(i, 1, "steady words here") for i in range(4)]
    # round 2: twice the volume, same steady terms + a new hot one
    r2 = [(100 + i, 2, "steady words here") for i in range(8)]
    r2 += [(200 + i, 2, "BREAKING BREAKING news") for i in range(4)]
    df = spark.createDataFrame(r1 + r2, ["doc_id", "period", "text"])
    out = textops.term_bursts(df, k=3, alpha=5.0)
    rows = {(r["period"], r["tok"]): r for r in out.collect()}
    top2 = [r for r in rows.values() if r["period"] == 2 and r["rank"] == 1]
    assert top2 and top2[0]["tok"] == "breaking"
    assert top2[0]["prev_rate_ppm"] == 0.0
    # steady terms in a bigger round: rate unchanged -> score ~ 1
    steady = rows.get((2, "steady"))
    if steady is not None:
        assert abs(steady["burst_score"] - 1.0) < 0.2
    # every period keeps <= k rows, dense ranks
    for p in (1, 2):
        ranks = sorted(r["rank"] for r in rows.values() if r["period"] == p)
        assert ranks == list(range(1, len(ranks) + 1)) and len(ranks) <= 3


def test_domain_kl_profile(spark):
    """A domain matching the corpus head shape scores ~0; a
    keyword-stuffed one scores high; hand-check the 2-term case."""
    import math

    rows = (
        [(i, "normal.example", "alpha beta") for i in range(8)]
        + [(100 + i, "spam.example", "alpha alpha alpha alpha") for i in range(2)]
    )
    df = spark.createDataFrame(rows, ["doc_id", "domain", "text"])
    out = {r["domain"]: r for r in
           textops.domain_kl_profile(df, head_n=2, alpha=0.5).collect()}
    # corpus head = {alpha: 16, beta: 8}; ghead = 24
    # normal: dtf = (8, 8), dhead 16 -> p = (8.5/17, 8.5/17)
    # spam:   dtf = (8, 0), dhead 8  -> p = (8.5/9, 0.5/9)
    q = [(16 + 0.5) / 25.0, (8 + 0.5) / 25.0]

    def kl(ps):
        return round(sum(p * math.log2(p / qq) for p, qq in zip(ps, q)), 6)

    assert out["normal.example"]["kl_bits"] == kl([8.5 / 17, 8.5 / 17])
    assert out["spam.example"]["kl_bits"] == kl([8.5 / 9, 0.5 / 9])
    assert out["spam.example"]["kl_bits"] > out["normal.example"]["kl_bits"]
    assert out["normal.example"]["n_tokens"] == 16
    assert out["spam.example"]["head_tokens"] == 8


def test_scheme_migration_report(spark):
    """Fully-migrated host flags migrate; a host below the share
    threshold or the path floor does not; re-crawl duplicates do not
    inflate path counts; merge map pairs only both-scheme paths."""
    from sparkcrawl.operators.mirrors import (
        scheme_merge_map,
        scheme_migration_report,
    )

    rows = [
        # migrated.example: 3 paths, /a under both, /b /c https-only
        ("http://migrated.example/a",),
        ("https://migrated.example/a",),
        ("https://migrated.example/a",),      # duplicate observation
        ("https://migrated.example/b",),
        ("https://migrated.example/c",),
        # split.example: 4 paths, half https -> share 0.5, no migrate
        ("https://split.example/1",), ("https://split.example/2",),
        ("http://split.example/3",), ("http://split.example/4",),
        # tiny.example: only 2 paths (< min_paths), all https
        ("https://tiny.example/x",), ("https://tiny.example/y",),
        ("ftp://other.example/z",),           # non-web scheme ignored
    ]
    df = spark.createDataFrame(rows, ["url"])
    got = {r["host"]: r for r in scheme_migration_report(df).collect()}
    m = got["migrated.example"]
    assert (m["n_paths"], m["n_both"], m["n_https_only"]) == (3, 1, 2)
    assert m["https_share"] == 1.0 and m["migrate"]
    s = got["split.example"]
    assert s["https_share"] == 0.5 and not s["migrate"]
    assert not got["tiny.example"]["migrate"]
    assert "other.example" not in got
    pairs = {(r["url_from"], r["url_to"])
             for r in scheme_merge_map(df).collect()}
    assert pairs == {("http://migrated.example/a",
                      "https://migrated.example/a")}


def test_token_fertility_by_lang(spark):
    """Hand-counted token lanes: 'hello, world 42' -> 3 ws tokens, 5
    regex tokens (hello , world 4-2 as one number run... verified
    below); empty-text language reports NULL ratios."""
    from sparkcrawl.operators.textops import token_fertility_by_lang

    rows = [
        (1, "en", "hello, world 42"),   # ws=3; re: hello , world 42 -> 4
        (2, "en", "a b"),               # ws=2; re: a b -> 2
        (3, "zz", ""),                  # ws=1 ([''])... chars=0
    ]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    got = {r["lang"]: r for r in token_fertility_by_lang(df).collect()}
    en = got["en"]
    assert (en["n_docs"], en["total_chars"]) == (2, 18)
    assert en["total_ws_tokens"] == 5
    assert en["total_re_tokens"] == 6
    assert en["fertility"] == round(6 / 5, 6)
    assert en["tokens_per_100_chars"] == round(600 / 18, 6)
    zz = got["zz"]
    assert zz["total_re_tokens"] == 0
    assert zz["tokens_per_100_chars"] is None


def test_host_language_profile(spark):
    """Hand-checked entropy and the struct-max majority tie-break
    (equal counts -> lexicographically larger lang wins)."""
    import math

    from sparkcrawl.operators.textops import host_language_profile

    rows = [
        ("mono", "en"), ("mono", "en"), ("mono", "en"),
        ("multi", "en"), ("multi", "de"), ("multi", "en"),
        ("multi", "fr"),
        ("tie", "de"), ("tie", "en"),
        ("solo", "zh"),
    ]
    df = spark.createDataFrame(rows, ["host", "lang"])
    got = {r["host"]: r for r in host_language_profile(df).collect()}
    m = got["mono"]
    assert (m["n_docs"], m["n_langs"], m["majority_lang"]) == (3, 1, "en")
    assert m["lang_entropy"] == 0.0 and not m["multilingual"]
    mu = got["multi"]
    assert mu["majority_lang"] == "en"
    assert mu["majority_share"] == 0.5
    exp = round(math.log(4) - (2 * math.log(2)) / 4, 6)
    assert mu["lang_entropy"] == exp and mu["multilingual"]
    assert got["tie"]["majority_lang"] == "en"     # ties -> larger lang
    s = got["solo"]
    assert not s["multilingual"]                    # below min_docs


def test_flesch_reading_ease(spark):
    """Hand-counted lanes: 'The cat sat. It ran!' -> 5 words, 2
    sentences, 5 vowel runs; empty/wordless docs report NULL."""
    from sparkcrawl.operators.textops import flesch_reading_ease

    rows = [
        (1, "The cat sat. It ran!"),
        (2, "12345 !!!"),
        (3, "Incomprehensibilities abound"),   # fragment: 1 sentence
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["id"]: r for r in flesch_reading_ease(df).collect()}
    r1 = got[1]
    assert (r1["n_words"], r1["n_sentences"], r1["n_syllables"]) == (5, 2, 5)
    assert r1["flesch"] == round(
        206.835 - 1.015 * (5 / 2) - 84.6 * (5 / 5), 4)
    r2 = got[2]
    assert r2["n_words"] == 0 and r2["flesch"] is None
    r3 = got[3]
    # in-com-pre-hen-si-bi-li-ties a-bound: vowel runs
    assert r3["n_sentences"] == 1
    assert r3["n_words"] == 2


def test_canary_scan(spark):
    """Exact containment only (no tokenization tricks); zero-hit
    canaries still report their clearance row; lowest hit id wins."""
    from sparkcrawl.operators.textops import canary_scan

    docs = spark.createDataFrame(
        [(5, "training text with CANARY-xyz inside"),
         (3, "another CANARY-xyz carrier"),
         (7, "clean document"),
         (9, "near miss CANARY-xy z")],
        ["doc_id", "text"])
    canaries = spark.createDataFrame(
        [("c1", "CANARY-xyz"), ("c2", "NEVER-SEEN")],
        ["name", "canary"])
    got = {r["name"]: r for r in canary_scan(docs, canaries).collect()}
    assert got["c1"]["n_hits"] == 2 and got["c1"]["example_doc"] == 3
    assert got["c2"]["n_hits"] == 0 and got["c2"]["example_doc"] is None
