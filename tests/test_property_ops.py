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
