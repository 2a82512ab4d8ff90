"""Property-based robustness for the round-3 operators (hypothesis).

Spark jobs are batched: each hypothesis example is a LIST of inputs
run through one Spark action, so max_examples stays small while input
coverage stays wide.
"""

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SETTINGS = dict(max_examples=8, deadline=None)

printable = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=60
)


@settings(**SETTINGS)
@given(st.lists(printable, min_size=1, max_size=20))
def test_trap_features_total_function(spark, texts):
    """Arbitrary strings (not just URLs) never crash the feature
    expressions, and every feature respects its invariants."""
    from sparkcrawl.operators.traps import url_trap_features

    urls = [("http://h.example/" + t,) for t in texts] + [(t,) for t in texts]
    df = url_trap_features(spark.createDataFrame(urls, ["url"]))
    for r in df.collect():
        assert r["depth"] >= 0
        assert 0 <= r["adjacent_repeats"] <= max(r["depth"] - 1, 0)
        assert r["digit_runs"] >= 0
        assert r["n_params"] >= 0
        assert r["host_template"] is not None


@settings(**SETTINGS)
@given(
    st.lists(
        st.lists(
            st.floats(
                min_value=-1e6, max_value=1e6,
                allow_nan=False, allow_infinity=False, width=32,
            ),
            min_size=1, max_size=16,
        ),
        min_size=1, max_size=12,
    )
)
def test_quantize_codes_bounded_and_accurate(spark, vecs):
    from sparkcrawl.operators.quantize import quantize_embeddings

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<float>"
    )
    for r in quantize_embeddings(df).collect():
        maxabs = max(abs(x) for x in r["embedding"])
        if maxabs == 0:
            assert r["qvec"] is None and r["scale"] is None
            continue
        assert all(-127 <= q <= 127 for q in r["qvec"])
        for orig, q in zip(r["embedding"], r["qvec"]):
            assert abs(q * r["scale"] - orig) <= maxabs / 254 * (1 + 1e-9)


@settings(**SETTINGS)
@given(st.lists(st.binary(max_size=40), min_size=1, max_size=24))
def test_mime_sniff_total_on_arbitrary_bytes(spark, payloads):
    from sparkcrawl.operators.multimodal import sniff_mime

    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)], "i long, payload binary"
    )
    out = df.select(sniff_mime(F.col("payload")).alias("mime")).collect()
    assert all(r["mime"] is not None and "/" in r["mime"] for r in out)


@settings(**SETTINGS)
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(1, 72), st.booleans()),
        min_size=2, max_size=40,
    )
)
def test_revisit_always_clamped(spark, obs):
    """Any change history yields revisit_sec inside [min, max]."""
    from datetime import datetime, timedelta

    from sparkcrawl.operators.freshness import (
        change_intervals, change_rates, revisit_intervals,
    )

    t0 = datetime(2026, 1, 1)
    rows, clocks = [], {}
    for key_i, gap_h, changed in obs:
        key = f"k{key_i}"
        clocks[key] = clocks.get(key, t0) + timedelta(hours=gap_h)
        rows.append((key, clocks[key], changed))
    hist = spark.createDataFrame(rows, ["url_hash", "ts", "changed"])
    out = revisit_intervals(
        change_rates(change_intervals(hist, changed="changed")),
        target_stale_prob=0.5, min_sec=600, max_sec=7 * 86400,
    ).collect()
    for r in out:
        assert 600 <= r["revisit_sec"] <= 7 * 86400


words = st.lists(
    st.text(alphabet=st.characters(min_codepoint=97, max_codepoint=122),
            min_size=1, max_size=8),
    min_size=0, max_size=30,
)


@settings(**SETTINGS)
@given(st.lists(words, min_size=1, max_size=10), st.integers(2, 9))
def test_pack_multimodal_tiling_invariants(spark, docs_words, seq_len):
    """For any corpus: non-dropped pieces tile each span exactly
    (contiguous offsets summing to the span's tokens), media pieces are
    whole-or-dropped, and no example exceeds seq_len tokens."""
    from sparkcrawl.operators.multimodal import pack_multimodal_sequences

    rows = []
    for i, ws in enumerate(docs_words):
        spans = []
        for j, w in enumerate(ws):
            if j % 3 == 2:
                spans.append({"kind": "media", "text": None,
                              "media_ref": f"m{i}_{j}", "offset": j})
            else:
                spans.append({"kind": "text", "text": w,
                              "media_ref": None, "offset": j})
        rows.append((f"d{i}", spans))
    df = spark.createDataFrame(
        rows,
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    cost = 3
    out = pack_multimodal_sequences(df, seq_len=seq_len, media_token_cost=cost)
    pieces = out.collect()
    by_span = {}
    per_example = {}
    for r in pieces:
        key = (r["doc_id"], r["span_idx"])
        by_span.setdefault(key, []).append(r)
        if r["example_id"] is not None:
            per_example[r["example_id"]] = (
                per_example.get(r["example_id"], 0) + r["piece_len"]
            )
    for key, rs in by_span.items():
        if rs[0]["kind"] == "media":
            assert len(rs) == 1
            r = rs[0]
            # whole (cost tokens in one example) or dropped
            assert (r["dropped"] and r["example_id"] is None
                    and r["piece_len"] == cost) or (
                        not r["dropped"] and r["piece_len"] == cost)
        else:
            rs = sorted(rs, key=lambda r: r["span_offset"])
            total = sum(r["piece_len"] for r in rs)
            # pieces tile the span contiguously from offset 0
            assert rs[0]["span_offset"] == 0
            for a, b in zip(rs, rs[1:]):
                assert b["span_offset"] == a["span_offset"] + a["piece_len"]
            assert all(not r["dropped"] for r in rs)
            assert total == rs[0]["span_offset"] + total  # non-empty tiling
    for ex, tot in per_example.items():
        assert tot <= seq_len


@settings(**SETTINGS)
@given(st.lists(st.text(alphabet="abcd", min_size=0, max_size=40),
                min_size=2, max_size=12))
def test_containment_bounds_and_prefix_law(spark, texts):
    """Containment is in (0, 1]; a document's PREFIX (long enough to
    shingle) is always fully contained in it."""
    from sparkcrawl.operators.textops import ngram_containment_pairs

    base = [(i, t) for i, t in enumerate(texts)]
    prefixes = [
        (1000 + i, t[:12]) for i, t in enumerate(texts) if len(t) >= 12
    ]
    df = spark.createDataFrame(base + prefixes, ["doc_id", "text"])
    out = ngram_containment_pairs(df, n=8, threshold=0.0)
    got = {(r["src_id"], r["dst_id"]): r["containment"] for r in out.collect()}
    for (s, d), c in got.items():
        assert 0.0 < c <= 1.0
    for i, t in enumerate(texts):
        if len(t) >= 12 and len(t) >= 8 + 4:  # prefix shingles exist
            # prefix -> original fully contained (when distinct docs share
            # the prefix's shingles the direction still scores 1.0)
            assert got.get((1000 + i, i)) == 1.0


@settings(**SETTINGS)
@given(st.lists(printable, min_size=1, max_size=15))
def test_gopher_keep_is_rule_conjunction(spark, texts):
    from sparkcrawl.operators.repetition import gopher_quality_rules

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    for r in gopher_quality_rules(df).collect():
        rules = [v for k, v in r.asDict().items() if k.startswith("rule_")]
        assert len(rules) == 7
        assert r["keep"] == all(rules)


@settings(**SETTINGS)
@given(st.lists(
    st.lists(printable.filter(lambda s: s.strip() != ""), min_size=1, max_size=5),
    min_size=1, max_size=10,
))
def test_paragraph_dedup_idempotent_and_conserving(spark, paras_per_doc):
    """r4 paragraph_dedup laws on arbitrary paragraph lists:
    (1) idempotence — running the dedup on its own output changes
    nothing (all survivors are already first occurrences);
    (2) conservation — every surviving paragraph existed in the input
    doc at the same relative order; (3) one winner per distinct
    paragraph corpus-wide."""
    from sparkcrawl.operators.textops import paragraph_dedup

    rows = [
        (i, "\n\n".join(p)) for i, p in enumerate(paras_per_doc)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    once = paragraph_dedup(docs)
    got1 = {r["id"]: r["text"] for r in once.collect()}
    twice = paragraph_dedup(
        spark.createDataFrame(
            [(i, t) for i, t in got1.items()], ["doc_id", "text"]
        )
    )
    got2 = {r["id"]: r["text"] for r in twice.collect()}
    assert got1 == got2  # idempotence
    all_kept = []
    for i, p in enumerate(paras_per_doc):
        kept = [x for x in got1[i].split("\n\n") if x != ""]
        all_kept.extend(kept)
        # conservation + order: kept is a subsequence of the input
        it = iter(p)
        assert all(any(x == y for y in it) for x in kept), (p, kept)
    # one winner per distinct paragraph corpus-wide
    assert len(all_kept) == len(set(all_kept))
