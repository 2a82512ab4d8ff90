"""Int8 embedding quantization (operators/quantize.py)."""

import math

from pyspark.sql import functions as F

from sparkcrawl.operators import quantize


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_quantize_roundtrip_error_bound(spark):
    vecs = [
        (1, [1.0, -0.5, 0.25, 0.0]),
        (2, [127.0, -127.0, 63.5, 1.0]),
        (3, [1e-3, 2e-3, -3e-3, 4e-3]),
    ]
    out = quantize.quantize_embeddings(_emb(spark, vecs)).collect()
    for r in out:
        maxabs = max(abs(x) for x in r["embedding"])
        assert abs(r["scale"] - maxabs / 127.0) < 1e-12
        for orig, q in zip(r["embedding"], r["qvec"]):
            assert -127 <= q <= 127
            # dequantization error <= scale/2 = maxabs/254
            assert abs(q * r["scale"] - orig) <= maxabs / 254 + 1e-12


def test_zero_vector_gets_null_code(spark):
    out = quantize.quantize_embeddings(
        _emb(spark, [(1, [0.0, 0.0]), (2, [1.0, 0.0])])
    ).collect()
    by_id = {r["vec_id"]: r for r in out}
    assert by_id[1]["scale"] is None and by_id[1]["qvec"] is None
    assert by_id[2]["qvec"] == [127, 0]


def test_quantized_cosine_tracks_exact(spark):
    import random

    rng = random.Random(7)
    vecs = [(i, [rng.uniform(-1, 1) for _ in range(32)]) for i in range(20)]
    qdf = quantize.quantize_embeddings(_emb(spark, vecs))
    pairs = (
        qdf.alias("a")
        .crossJoin(qdf.alias("b"))
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("ia"),
            F.col("b.vec_id").alias("ib"),
            quantize.quantized_cosine(F.col("a.qvec"), F.col("b.qvec")).alias("qc"),
        )
        .collect()
    )
    by_pair = {(r["ia"], r["ib"]): r["qc"] for r in pairs}

    def cos(u, v):
        d = sum(x * y for x, y in zip(u, v))
        return d / math.sqrt(sum(x * x for x in u) * sum(y * y for y in v))

    for (i, j), qc in by_pair.items():
        assert abs(qc - cos(vecs[i][1], vecs[j][1])) < 0.02  # SQ8 noise floor


def test_topk_recall_vs_exact(spark):
    import random

    rng = random.Random(3)
    # clustered fixture: 4 loose clusters so top-k is non-trivial
    centers = [[rng.uniform(-1, 1) for _ in range(16)] for _ in range(4)]
    vecs = [
        (i, [c + rng.uniform(-0.15, 0.15) for c in centers[i % 4]])
        for i in range(60)
    ]
    df = _emb(spark, vecs)
    queries = df.filter(F.col("vec_id") < 4)
    got = quantize.brute_force_topk_quantized(queries, df, k=5).collect()
    approx = {}
    for r in got:
        approx.setdefault(r["query_id"], set()).add(r["corpus_id"])

    def cos(u, v):
        d = sum(x * y for x, y in zip(u, v))
        return d / math.sqrt(sum(x * x for x in u) * sum(y * y for y in v))

    hits = total = 0
    for qid in range(4):
        exact = sorted(
            (i for i, _ in vecs if i != qid),
            key=lambda i: -cos(vecs[qid][1], vecs[i][1]),
        )[:5]
        hits += len(approx[qid] & set(exact))
        total += 5
    assert hits / total >= 0.9


def test_quantized_ops_stay_jvm_side(spark):
    import contextlib
    import io

    df = quantize.quantize_embeddings(_emb(spark, [(1, [1.0, 2.0])]))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pq_encode_exact_on_codebook_sources(spark):
    """PQ invariants: codebook shape m*n_codes; a vector that IS a
    codebook source encodes to its own code in every subspace
    (distance 0 beats everything); codes are bounded by n_codes."""
    from pyspark.sql import functions as F

    from sparkcrawl.operators.quantize import pq_codebooks, pq_encode

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cb = pq_codebooks(emb, m=8, n_codes=16, dim=64)
    assert cb.count() == 8 * 16
    codes = pq_encode(emb, cb, m=8, dim=64)
    rows = {r["id"]: r["codes"] for r in codes.collect()}
    assert all(len(c) == 8 and all(0 <= x < 16 for x in c) for c in rows.values())
    # the 16 lowest-id vectors are the codebook sources: vector c must
    # self-encode as [c]*8 (its own subvectors are at distance 0; ties
    # broken toward the lowest code can only fire on duplicate sources)
    src_ids = [r["vec_id"] for r in
               emb.orderBy(F.asc("vec_id")).limit(16).collect()]
    for c, vid in enumerate(src_ids):
        assert rows[vid] == [c] * 8, (vid, rows[vid])


def test_pq_topk_orders_by_adc(spark):
    """ADC top-k: per query, ranks are dense from 1, adist is
    non-decreasing, the query never returns itself."""
    from pyspark.sql import functions as F

    from sparkcrawl.operators.quantize import pq_codebooks, pq_encode, pq_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cb = pq_codebooks(emb, m=8, n_codes=16, dim=64)
    codes = pq_encode(emb, cb, m=8, dim=64)
    q = emb.filter(F.col("vec_id") < 2)
    out = pq_topk(q, codes, cb, k=5, m=8, dim=64).collect()
    by_q = {}
    for r in out:
        assert r["cand_id"] != r["query_id"]
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["adist"]))
    for ranks in by_q.values():
        ranks.sort()
        assert [x[0] for x in ranks] == list(range(1, len(ranks) + 1))
        dists = [x[1] for x in ranks]
        assert dists == sorted(dists)


def test_ivfpq_full_probe_matches_pq(spark):
    """IVF-PQ with nprobe == n_cells degenerates to the full ADC scan:
    every cell is probed, so the candidate set is the whole corpus and
    the result must equal pq_topk row-for-row. This pins the coarse
    quantizer as a pure candidate-pruning layer — it must never change
    distances or ordering, only drop cells."""
    from pyspark.sql import functions as F

    from sparkcrawl.operators.quantize import (
        ivfpq_topk, pq_codebooks, pq_encode, pq_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 2)
    cb = pq_codebooks(emb, m=8, n_codes=16, dim=64)
    codes = pq_encode(emb, cb, m=8, dim=64)
    full = sorted(map(tuple, pq_topk(q, codes, cb, k=5, m=8, dim=64).collect()))
    ivf = sorted(map(tuple, ivfpq_topk(
        emb, q, k=5, n_cells=4, m=8, n_codes=16, dim=64, nprobe=4,
        codebooks=cb).collect()))
    assert ivf == full


def test_ivfpq_narrow_probe_prunes(spark):
    """nprobe=1: candidates are confined to each query's own cell —
    every returned cand_id shares the query's IVF assignment."""
    from pyspark.sql import functions as F

    from sparkcrawl.operators.quantize import ivfpq_topk
    from sparkcrawl.operators.simsearch import ivf_assign

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 2)
    out = ivfpq_topk(emb, q, k=5, n_cells=8, m=8, n_codes=16, dim=64,
                     nprobe=1).collect()
    assert out, "narrow probe should still find same-cell candidates"
    centroids = (
        emb.orderBy(F.asc("vec_id")).limit(8)
        .select(F.col("vec_id").alias("centroid_id"),
                F.col("embedding").alias("c_vec")))
    cell = {r["id"]: r["centroid_id"]
            for r in ivf_assign(emb, centroids).collect()}
    for r in out:
        assert cell[r["cand_id"]] == cell[r["query_id"]], r


def test_content_type_mismatch(spark):
    """Every severity lane: param/case normalization agrees, html-
    as-png conflicts, unsniffable bodies refine, missing headers are
    undeclared."""
    from sparkcrawl.operators.multimodal import content_type_mismatch

    rows = [
        ("u1", bytes.fromhex("89504E470D0A1A0A") + b"x",
         "image/png; charset=binary"),
        ("u2", b"<!DOCTYPE html><p>hi", "image/png"),
        ("u3", b"plain words only", "text/plain"),
        ("u4", bytes.fromhex("25504446") + b"-1.4", None),
        ("u5", bytes.fromhex("474946383961") + b"x", "IMAGE/GIF "),
    ]
    df = spark.createDataFrame(rows, ["url", "payload", "content_type"])
    got = {r["id"]: r for r in content_type_mismatch(df).collect()}
    assert got["u1"]["severity"] == "agree" and got["u1"]["match"]
    assert got["u2"]["severity"] == "conflict" and not got["u2"]["match"]
    assert got["u2"]["sniffed"] == "text/html"
    assert got["u3"]["severity"] == "refines" and not got["u3"]["match"]
    assert got["u4"]["severity"] == "undeclared" and got["u4"]["match"]
    assert got["u5"]["severity"] == "agree"     # case + trim normalized
