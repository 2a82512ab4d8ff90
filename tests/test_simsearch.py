"""Similarity search: brute-force cosine top-k, LSH buckets, near-dup pairs."""

import math

import pytest
from pyspark.sql import functions as F

from sparkcrawl.operators import simsearch


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0, 0.0]),    # close to 1
        (3, [0.0, 1.0, 0.0, 0.0]),    # orthogonal to 1
        (4, [-1.0, 0.0, 0.0, 0.0]),   # opposite of 1
        (5, [1.0, 0.01, 0.0, 0.0]),   # nearly identical to 1
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"]).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )


def test_brute_force_topk_order(vecs):
    q = vecs.filter("vec_id = 1")
    out = simsearch.brute_force_topk(vecs, q, k=3).orderBy("rank").collect()
    assert [r["cand_id"] for r in out] == [5, 2, 3]
    assert out[0]["sim"] == pytest.approx(
        1.0 / math.sqrt(1 + 0.01**2), abs=1e-4
    )


def test_lsh_bucket_join_subset_of_bruteforce(vecs):
    q = vecs.filter("vec_id = 1")
    lsh = simsearch.lsh_bucketed_topk(
        vecs, q, k=3, n_planes=2, dim=4, n_bands=2
    ).collect()
    cands = {r["cand_id"] for r in lsh}
    # 5 = (1, .01, 0, 0) ≈ 1 = (1, 0, 0, 0): every ±1 projection has the
    # same sign for both (|±1*.01| < |±1*1|) -> collides in every band.
    assert 5 in cands
    # 4 = -1's projections are exactly negated -> never shares a bucket.
    assert 4 not in cands
    # LSH sims must equal brute-force sims for shared candidates
    bf = {r["cand_id"]: r["sim"] for r in simsearch.brute_force_topk(vecs, q, k=4).collect()}
    for r in lsh:
        assert r["sim"] == bf[r["cand_id"]]


def test_near_dup_pairs(vecs):
    pairs = {(r["id_a"], r["id_b"]) for r in
             simsearch.embedding_near_dup_pairs(vecs, threshold=0.99, dim=4).collect()}
    assert (1, 5) in pairs
    assert (1, 4) not in pairs


def _skewed_fixture(spark, n=80, dim=8):
    """All-positive-dim vectors: the axis-aligned sign bucket (r1's LSH)
    collapses these into ONE bucket; seeded ±1 projections must not."""
    rows = [
        (i, [((i * 7 + d * 13) % 23 + 1) / 23.0 for d in range(dim)])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"]).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )


def test_random_projection_buckets_balanced_on_skewed_data(spark):
    vecs = _skewed_fixture(spark)
    from pyspark.sql import functions as SF

    b = vecs.select(
        simsearch.hyperplane_bucket(F.col("embedding"), n_planes=3, dim=8).alias("bucket")
    )
    sizes = [r["n"] for r in b.groupBy("bucket").agg(SF.count("*").alias("n")).collect()]
    assert len(sizes) >= 3          # axis-sign bucketing would yield exactly 1
    assert max(sizes) <= 0.6 * 80   # no degenerate everything-bucket


def test_lsh_recall_vs_bruteforce_on_skewed_data(spark):
    vecs = _skewed_fixture(spark)
    q = vecs.filter("vec_id < 4")
    exact = {
        (r["query_id"], r["cand_id"])
        for r in simsearch.brute_force_topk(vecs, q, k=5).collect()
    }
    approx = {
        (r["query_id"], r["cand_id"])
        for r in simsearch.lsh_bucketed_topk(
            vecs, q, k=5, n_planes=3, dim=8, n_bands=4
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"recall {recall:.2f}"


def test_near_dup_bucket_cap_bounds_join(spark):
    vecs = _skewed_fixture(spark)
    uncapped = simsearch.embedding_near_dup_pairs(
        vecs, threshold=0.8, n_planes=2, dim=8, n_bands=2
    ).collect()
    capped = simsearch.embedding_near_dup_pairs(
        vecs, threshold=0.8, n_planes=2, dim=8, n_bands=2, max_bucket_size=10
    ).collect()
    # the cap only removes pairs (degenerate buckets), never invents them
    assert {(r["id_a"], r["id_b"]) for r in capped} <= {
        (r["id_a"], r["id_b"]) for r in uncapped
    }


@pytest.fixture(scope="module")
def semdedup_fixture(spark):
    """Two well-separated clusters with near-dups inside each."""
    rows = [
        (10, [1.0, 0.0, 0.0, 0.0]),
        (11, [0.95, 0.05, 0.0, 0.0]),   # near-dup of 10 (cos ~0.9986)
        (12, [0.6, 0.8, 0.0, 0.0]),     # same cluster, cos 0.6 to 10
        (20, [0.0, 0.0, 1.0, 0.0]),
        (21, [0.0, 0.0, 0.97, 0.03]),   # near-dup of 20 (cos ~0.9995)
        (22, [0.0, 0.0, 1.0, 0.0]),     # identical to 20
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"]).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 0.0, 1.0, 0.0])],
        ["centroid_id", "c_vec"],
    ).withColumn("c_vec", F.col("c_vec").cast("array<float>"))
    return emb, cents


def test_semantic_dedup_keeps_lowest_id_rep(semdedup_fixture):
    emb, cents = semdedup_fixture
    out = simsearch.semantic_dedup(emb, threshold=0.95, centroids=cents)
    rows = {r["id"]: r for r in out.collect()}
    assert {i for i, r in rows.items() if r["keep"]} == {10, 12, 20}
    # dropped rows point at their best lower-id neighbor
    assert rows[11]["dup_of"] == 10
    assert rows[21]["dup_of"] == 20
    # 22 ties to both 20 (sim 1.0) and 21 (~0.9995): highest sim wins
    assert rows[22]["dup_of"] == 20
    assert rows[22]["sim"] == pytest.approx(1.0)
    # kept rows carry NULL dup_of/sim
    assert rows[10]["dup_of"] is None and rows[10]["sim"] is None
    # cluster assignment surfaced
    assert rows[11]["centroid_id"] == 0 and rows[21]["centroid_id"] == 1


def test_semantic_dedup_cap_only_removes_drops(semdedup_fixture):
    emb, cents = semdedup_fixture
    capped = simsearch.semantic_dedup(
        emb, threshold=0.95, centroids=cents, max_cluster_size=1
    ).collect()
    # cluster capped to one row -> the self-join finds no pairs ->
    # nothing is dropped, and EVERY input id still gets a verdict row
    # (the cap bounds the pair search, never the output)
    assert len(capped) == emb.count()
    assert all(r["keep"] for r in capped)


def test_semantic_dedup_plan_no_window(semdedup_fixture):
    import contextlib
    import io

    emb, cents = semdedup_fixture
    df = simsearch.semantic_dedup(emb, threshold=0.95, centroids=cents)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    # assignment AND duplicate argmax are max_by hash aggs — a window
    # would sort every cluster partition for the same answer
    assert "Window" not in buf.getvalue()


def test_ivf_topk_cell_restricted(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter("vec_id < 2")
    ivf = simsearch.ivf_topk(emb, q, k=5, n_cells=4).collect()
    assert len(ivf) > 0
    # IVF sims must equal brute-force sims for shared candidates
    bf = {(r["query_id"], r["cand_id"]): r["sim"]
          for r in simsearch.brute_force_topk(emb, q, k=200).collect()}
    for r in ivf:
        key = (r["query_id"], r["cand_id"])
        if key in bf:
            assert r["sim"] == bf[key]
    # ranks well-formed per query
    for qid in {r["query_id"] for r in ivf}:
        ranks = sorted(r["rank"] for r in ivf if r["query_id"] == qid)
        assert ranks == list(range(1, len(ranks) + 1))


def test_kmeans_ivf_recall_vs_bruteforce(spark):
    """K-means-fitted IVF: recall vs brute force must be decent and
    monotone in nprobe (the recall knob VERDICT r1 asked to quantify)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter("vec_id < 5")
    exact = {
        (r["query_id"], r["cand_id"])
        for r in simsearch.brute_force_topk(emb, q, k=5).collect()
    }
    cents = simsearch.kmeans_fit(emb, k=8, iters=3)
    assert cents.count() == 8
    recalls = {}
    for nprobe in (1, 2, 4):
        approx = {
            (r["query_id"], r["cand_id"])
            for r in simsearch.ivf_topk(
                emb, q, k=5, nprobe=nprobe, centroids=cents
            ).collect()
        }
        recalls[nprobe] = len(exact & approx) / len(exact)
    assert recalls[1] <= recalls[2] <= recalls[4]
    assert recalls[4] >= 0.7, recalls
    assert recalls[1] >= 0.3, recalls


def test_on_real_testdata(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.limit(2)
    out = simsearch.brute_force_topk(emb, q, k=5)
    rows = out.collect()
    assert len(rows) == 10
    assert all(-1.0 <= r["sim"] <= 1.0 for r in rows)
    ranks = sorted(r["rank"] for r in rows if r["query_id"] == rows[0]["query_id"])
    assert ranks == [1, 2, 3, 4, 5]


def test_multimodal_plumbing(spark):
    from sparkcrawl.operators import multimodal
    from sparkcrawl.schemas import DOCUMENTS_SCHEMA

    rows = [
        ("d1", [("text", "a", "", 0), ("media", "", "http://x/i.png", 1),
                ("media", "", "http://x/v.mp4", 2)]),
        ("d2", [("media", "", "http://x/i.png", 0)]),
    ]
    docs = spark.createDataFrame(rows, DOCUMENTS_SCHEMA)
    media = multimodal.media_table_from_spans(docs)
    got = {r["media_ref"]: r["media_type"] for r in media.collect()}
    assert got == {"http://x/i.png": "image", "http://x/v.mp4": "video"}

    feats = multimodal.decode_and_featurize(media).collect()
    assert all(len(r["feature"]) == 8 for r in feats)
    assert all(16 <= r["width"] < 80 for r in feats)
    # determinism
    feats2 = multimodal.decode_and_featurize(media).collect()
    assert sorted(map(str, feats)) == sorted(map(str, feats2))

    frames = multimodal.frame_sample_stub(media).collect()
    assert all(r["media_ref"] == "http://x/v.mp4" for r in frames)

    import pytest as _pytest

    with _pytest.raises(Exception):
        # non-PNG payloads still need real decoders (guarded seam)
        multimodal.decode_and_featurize(media, fake=False).collect()


def test_real_png_header_decode(spark):
    """fake=False real kernel: IHDR width/height parsed from raw bytes."""
    import struct

    from sparkcrawl.operators import multimodal

    def png(width, height):
        return (
            b"\x89PNG\r\n\x1a\n"
            + struct.pack(">I", 13) + b"IHDR"
            + struct.pack(">II", width, height)
            + bytes([8, 6, 0, 0, 0]) + b"\x00" * 16  # depth/color + junk
        )

    assert multimodal.parse_png_ihdr(png(640, 480)) == (640, 480)
    assert multimodal.parse_png_ihdr(b"notapng") is None

    rows = [
        ("ref1.png", png(640, 480), "image", 45),
        ("ref2.png", png(32, 1080), "image", 45),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = {
        r["media_ref"]: (r["width"], r["height"], len(r["feature"]))
        for r in multimodal.decode_and_featurize(media, fake=False).collect()
    }
    assert got == {"ref1.png": (640, 480, 8), "ref2.png": (32, 1080, 8)}


def test_media_ref_rollup_and_layout(spark):
    """media_ref_rollup / span_layout_stats over the input_hint span
    schema: hand-built interleaved docs with shared media refs."""
    from sparkcrawl.operators import multimodal

    rows = [
        # doc 1: text, then shared logo
        (1, [("text", "hello world", None, 0), ("media", None, "logo.png", 1)]),
        # doc 2: media-first, same logo twice (repeat within doc)
        (2, [("media", None, "logo.png", 0), ("text", "hi", None, 1),
             ("media", None, "logo.png", 2)]),
        # doc 3: text-only
        (3, [("text", "just text", None, 0)]),
        # doc 4: unique media
        (4, [("text", "x", None, 0), ("media", None, "v.mp4", 1)]),
    ]
    docs = spark.createDataFrame(
        rows,
        "doc_id bigint, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    roll = {r["media_ref"]: r for r in multimodal.media_ref_rollup(docs).collect()}
    assert set(roll) == {"logo.png", "v.mp4"}
    assert roll["logo.png"]["n_docs"] == 2          # docs 1 and 2
    assert roll["logo.png"]["n_refs"] == 3          # doc 2 embeds it twice
    assert roll["logo.png"]["first_doc"] == 1
    assert roll["v.mp4"]["n_docs"] == 1 and roll["v.mp4"]["first_doc"] == 4

    lay = {r["doc_id"]: r for r in multimodal.span_layout_stats(docs).collect()}
    assert lay[1]["n_text"] == 1 and lay[1]["n_media"] == 1
    assert lay[1]["text_chars"] == 11 and lay[1]["media_lead"] is False
    assert lay[1]["first_media_offset"] == 1
    assert lay[2]["n_media"] == 2 and lay[2]["media_lead"] is True
    assert lay[2]["first_media_offset"] == 0
    assert lay[3]["n_media"] == 0 and lay[3]["first_media_offset"] is None
    # layout is a pure projection: no shuffle, no python
    plan = (multimodal.span_layout_stats(docs)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan, plan
    assert "Python" not in plan, plan


def test_media_caption_pairs(spark):
    """CLIP-style pair mining: after-preferred nearest text neighbor,
    before fallback, empty-text skip, distance cap — and the plan is a
    pure projection (no join, no exchange)."""
    from pyspark.sql import functions as F

    from sparkcrawl.operators.multimodal import media_caption_pairs

    rows = [
        ("d1", [("text", "intro", "", 0), ("media", "", "http://m/1.png", 1),
                ("text", "caption one", "", 2)]),
        ("d2", [("media", "", "http://m/2.png", 0), ("text", "cap two", "", 1)]),
        ("d3", [("text", "before cap", "", 0), ("media", "", "http://m/3.png", 1)]),
        ("d4", [("media", "", "http://m/4.png", 0), ("media", "", "http://m/5.png", 1)]),
        ("d5", [("text", "far", "", 0), ("media", "", "http://m/6.png", 2)]),
        ("d6", [("media", "", "http://m/7.png", 0), ("text", "", "", 1),
                ("text", "real", "", 2)]),
    ]
    df = spark.createDataFrame(
        rows, "doc_id string, spans array<struct<kind:string,text:string,"
              "media_ref:string,offset:int>>")
    got = {(r["doc_id"]): (r["caption"], r["caption_side"])
           for r in media_caption_pairs(df).collect()}
    assert got == {
        "d1": ("caption one", "after"),   # after beats the preceding intro
        "d2": ("cap two", "after"),
        "d3": ("before cap", "before"),   # fallback
        # d4: no text at all; d5: text out of range; d6: only empty text
        # within range -> all three produce no pair
    }
    # distance 2 rescues d5 and d6
    got2 = {r["doc_id"]: r["caption"]
            for r in media_caption_pairs(df, max_distance=2).collect()}
    assert got2["d5"] == "far" and got2["d6"] == "real"

    import contextlib, io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        media_caption_pairs(df).explain("simple")
    p = buf.getvalue()
    assert "Join" not in p and "Exchange" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def _spans_df(spark, rows):
    """rows: list of (doc_id, [(kind, text, media_ref)...])."""
    data = [
        (
            did,
            [
                {"kind": k, "text": t, "media_ref": m, "offset": i}
                for i, (k, t, m) in enumerate(spans)
            ],
        )
        for did, spans in rows
    ]
    return spark.createDataFrame(
        data,
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )


def test_pack_multimodal_text_splits_media_atomic(spark):
    from sparkcrawl.operators.multimodal import pack_multimodal_sequences

    # single doc -> global order trivially deterministic
    df = _spans_df(spark, [
        ("d1", [("text", "a b c d", None),      # 4 tokens  [0,4)
                ("media", None, "m1.png"),       # cost 5    [4,9) straddles 8
                ("text", "e f", None)]),         # 2 tokens  [9,11)
    ])
    out = pack_multimodal_sequences(df, seq_len=8, media_token_cost=5)
    rows = {(r["doc_id"], r["span_idx"], r["example_id"]): r
            for r in out.collect()}
    # text span 0 fits example 0 whole
    r0 = rows[("d1", 0, 0)]
    assert (r0["span_offset"], r0["piece_len"], r0["dropped"]) == (0, 4, False)
    # media straddles the 8-token boundary -> atomic drop, NULL example
    rm = rows[("d1", 1, None)]
    assert rm["dropped"] and rm["piece_len"] == 5 and rm["kind"] == "media"
    # positions are NOT re-flowed after the drop: text span 2 still
    # starts at global token 9 -> example 1
    r2 = rows[("d1", 2, 1)]
    assert (r2["span_offset"], r2["piece_len"]) == (0, 2)


def test_pack_multimodal_long_text_pieces_and_fitting_media(spark):
    from sparkcrawl.operators.multimodal import pack_multimodal_sequences

    df = _spans_df(spark, [
        ("d1", [("media", None, "m1.png"),                   # cost 8 [0,8) fits
                ("text", " ".join(["t"] * 20), None)]),      # [8,28)
    ])
    out = pack_multimodal_sequences(df, seq_len=8, media_token_cost=8)
    rows = sorted(out.collect(), key=lambda r: (r["span_idx"], r["example_id"]))
    # media exactly fills example 0: kept, not dropped
    assert rows[0]["kind"] == "media" and not rows[0]["dropped"]
    assert rows[0]["example_id"] == 0 and rows[0]["piece_len"] == 8
    # 20-token text splits into 8 + 8 + 4 across examples 1..3, with
    # span_offset tracking the cut position INSIDE the span
    text_pieces = [(r["example_id"], r["span_offset"], r["piece_len"])
                   for r in rows[1:]]
    assert text_pieces == [(1, 0, 8), (2, 8, 8), (3, 16, 4)]


def test_semantic_dedup_canonical_transitive_keep_min(spark):
    """A~B and B~C but A!~C at the threshold: the component step must
    merge all three into ONE cluster keeping only the min id — a
    pair-level rule would keep A and C (leaving a near-dup of B) or
    double-delete. Vector 9 is orthogonal: a surviving singleton."""
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.9, 0.4359, 0.0, 0.0]),   # cos(1,2) ~= 0.90
        (3, [0.62, 0.7846, 0.0, 0.0]),  # cos(2,3) ~= 0.90, cos(1,3) ~= 0.62
        (9, [0.0, 0.0, 1.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"]).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )
    kept = simsearch.semantic_dedup_canonical(
        emb, threshold=0.85, n_planes=2, dim=4, n_bands=2
    )
    assert sorted(r["vec_id"] for r in kept.collect()) == [1, 9]
    # sanity: the pair list itself has no (1,3) edge at the threshold
    pairs = simsearch.embedding_near_dup_pairs(
        emb, threshold=0.85, n_planes=2, dim=4, n_bands=2
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 2), (2, 3)}


def test_real_gif_bmp_header_decode(spark):
    """fake=False kernels beyond PNG: GIF logical-screen descriptor and
    BMP BITMAPINFOHEADER dims from hand-built bytes (incl. GIF87a vs
    GIF89a, top-down negative-height BMP, and the mixed-format batch
    through mapInPandas)."""
    import struct

    from sparkcrawl.operators import multimodal

    def gif(width, height, ver=b"GIF89a"):
        return ver + struct.pack("<HH", width, height) + b"\x00" * 6

    def bmp(width, height):
        return (
            b"BM" + struct.pack("<IHHI", 70, 0, 0, 54)      # file header
            + struct.pack("<Iii", 40, width, height)        # info header
            + b"\x00" * 28
        )

    assert multimodal.parse_gif_header(gif(320, 200)) == (320, 200)
    assert multimodal.parse_gif_header(gif(17, 9, b"GIF87a")) == (17, 9)
    assert multimodal.parse_gif_header(b"GIF88a" + b"\x00" * 8) is None
    assert multimodal.parse_bmp_header(bmp(800, 600)) == (800, 600)
    assert multimodal.parse_bmp_header(bmp(800, -600)) == (800, 600)  # top-down
    assert multimodal.parse_bmp_header(b"notabmp" * 8) is None

    rows = [
        ("a.gif", gif(320, 200), "image", 16),
        ("b.bmp", bmp(800, 600), "image", 70),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = {
        r["media_ref"]: (r["width"], r["height"], len(r["feature"]))
        for r in multimodal.decode_and_featurize(media, fake=False).collect()
    }
    assert got == {"a.gif": (320, 200, 8), "b.bmp": (800, 600, 8)}


def test_dbscan_lsh_invariants_vs_pairs(spark):
    """Structural DBSCAN invariants recomputed brute-force from the
    operator's OWN pair list at sf0.001: role partition, core degree
    >= min_pts-1, border has a core neighbor, noise has none, cluster
    label = min core id of the core component."""
    from pyspark.sql import functions as F

    from sparkcrawl.operators.simsearch import dbscan_lsh, embedding_near_dup_pairs

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    kw = dict(threshold=0.3, n_planes=3, dim=64, seed=0, n_bands=2,
              max_bucket_size=150)
    pairs = [(r["id_a"], r["id_b"]) for r in
             embedding_near_dup_pairs(emb, **kw).collect()]
    out = {r["id"]: (r["role"], r["cluster"])
           for r in dbscan_lsh(emb, min_pts=4, **kw).collect()}
    n_ids = emb.count()
    assert len(out) == n_ids

    nbrs: dict[int, set[int]] = {}
    for a, b in pairs:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    core = {i for i, ns in nbrs.items() if len(ns) + 1 >= 4}
    # union-find over core-core edges
    parent = {i: i for i in core}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        if a in core and b in core:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    label = {i: min(j for j in core if find(j) == find(i)) for i in core}

    roles = {"core": 0, "border": 0, "noise": 0}
    for i, (role, cluster) in out.items():
        roles[role] += 1
        if i in core:
            assert role == "core" and cluster == label[i], i
        elif nbrs.get(i, set()) & core:
            assert role == "border", i
            assert cluster == min(label[c] for c in nbrs[i] & core), i
        else:
            assert role == "noise" and cluster == -1, i
    assert min(roles.values()) > 0, roles


def test_cluster_downsample_caps_clusters_keeps_noise(spark):
    """Cap-invariants recomputed brute-force: every cluster emits
    min(cap, size) rows, noise passes through untouched, and the kept
    members are exactly the cap-smallest by md5(salt||id) — i.e. the
    draw is the documented salted hash, not Spark partition order."""
    import hashlib

    from pyspark.sql import functions as F

    from sparkcrawl.operators.simsearch import cluster_downsample, dbscan_lsh

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    assign = dbscan_lsh(emb, threshold=0.3, min_pts=4, n_planes=3, dim=64,
                        seed=0, n_bands=2, max_bucket_size=150)
    full = [(r["id"], r["cluster"]) for r in assign.collect()]
    kept = {(r["id"], r["cluster"])
            for r in cluster_downsample(assign, cap=3, salt="ds").collect()}

    by_cluster: dict[int, list[int]] = {}
    noise = set()
    for i, c in full:
        if c < 0:
            noise.add((i, c))
        else:
            by_cluster.setdefault(c, []).append(i)
    expect = set(noise)
    for c, ids in by_cluster.items():
        draw = sorted(ids, key=lambda i: (
            hashlib.md5(f"ds{i}".encode()).hexdigest(), i))
        expect.update((i, c) for i in draw[:3])
    assert kept == expect
    assert any(len(ids) > 3 for ids in by_cluster.values()), \
        "fixture never exercised the cap"


def test_knn_graph_every_node_ranked_and_bounded(spark):
    """kNN graph over three tight clusters: every node's top neighbors
    are its cluster-mates, ranks are 1..k dense per source, and no
    all-pairs edge across distant clusters survives bucketing."""
    import math

    from sparkcrawl.operators._caching import release_caches
    from sparkcrawl.operators.simsearch import cosine, knn_graph

    def unit(theta):
        # 2-D directions embedded in dim=4 so hyperplanes have work
        return [math.cos(theta), math.sin(theta), 0.0, 0.0]

    rows = []
    for c, base in enumerate([0.1, 1.6, 3.1]):  # ~90deg apart
        for j in range(4):
            rows.append((c * 10 + j, unit(base + 0.02 * j)))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    g = knn_graph(emb, k=2, n_planes=6, dim=4, seed=1, n_bands=3).collect()
    release_caches()
    by_src = {}
    for r in g:
        by_src.setdefault(r.src, []).append(r)
    for src, edges in by_src.items():
        ranks = sorted(e.rank for e in edges)
        assert ranks == list(range(1, len(edges) + 1))
        assert len(edges) <= 2
        # sims are non-increasing with rank
        ordered = sorted(edges, key=lambda e: e.rank)
        assert all(a.sim >= b.sim for a, b in zip(ordered, ordered[1:]))
        # top neighbor of each node is a cluster-mate (sim ~ 1)
        assert ordered[0].dst // 10 == src // 10


def test_knn_graph_matches_bucket_restricted_bruteforce(spark):
    """The graph must equal exact brute-force kNN restricted to
    bucket-mates — recomputed here with the library's own hyperplanes
    as the independent reference."""
    import math

    from sparkcrawl.operators._caching import release_caches
    from sparkcrawl.operators.simsearch import hyperplane_weights, knn_graph

    rows = [(i, [1.0, 0.1 * i, 0.2 * (i % 3), 0.0]) for i in range(8)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    g = {(r.src, r.rank): (r.dst, r.sim)
         for r in knn_graph(emb, k=2, n_planes=2, dim=4, seed=0).collect()}
    release_caches()

    planes = hyperplane_weights(4, 2, seed=0, band=0)
    vecs = dict(rows)

    def bucket(v):
        return sum(
            (1 << p) for p, w in enumerate(planes)
            if sum(wi * vi for wi, vi in zip(w, v)) >= 0
        )

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return round(
            d / math.sqrt(sum(x * x for x in a) * sum(x * x for x in b)), 6
        )

    expected = {}
    for i in range(8):
        mates = [j for j in range(8) if j != i and bucket(vecs[j]) == bucket(vecs[i])]
        scored = sorted(((cos(vecs[i], vecs[j]), -j) for j in mates), reverse=True)
        for rank, (s, nj) in enumerate(scored[:2], start=1):
            expected[(i, rank)] = (-nj, s)
    assert g == expected
    assert expected, "fixture produced no bucket-mates at all"


def test_margin_alignment_scores(spark):
    """Margins recomputed exactly from the operator's own kNN graph
    (integer micro-unit averaging), and the aligned near-identical
    pair scores a higher margin than background edges."""
    from collections import defaultdict

    from sparkcrawl.operators import simsearch

    rows = [
        (1, [1.0, 0.02, 0.0, 0.0]),
        (2, [0.99, 0.05, 0.01, 0.0]),   # aligned with 1
        (3, [0.8, 0.4, 0.3, 0.1]),
        (4, [0.7, 0.5, 0.2, 0.3]),
        (5, [0.75, 0.3, 0.5, 0.2]),
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    kw = dict(k=3, n_planes=1, dim=4, seed=0, n_bands=1)
    g = simsearch.knn_graph(emb, **kw).collect()
    s, c = defaultdict(int), defaultdict(int)
    for r in g:
        s[r["src"]] += int(round(r["sim"] * 1e6))
        c[r["src"]] += 1
    sims = {(r["src"], r["dst"]): r["sim"] for r in g}

    out = simsearch.margin_alignment_scores(emb, **kw).collect()
    assert {(r["id_a"], r["id_b"]) for r in out} == set(sims)
    margins = {}
    for r in out:
        d = (s[r["id_a"]] / c[r["id_a"]] + s[r["id_b"]] / c[r["id_b"]]) / 2e6
        assert abs(r["margin"] - r["sim"] / d) < 2e-6
        margins[(r["id_a"], r["id_b"])] = r["margin"]
    # the aligned pair stands out above its neighborhood background
    assert margins[(1, 2)] > 1.0
    assert margins[(1, 2)] == max(margins.values())


def test_main_content_spans(spark):
    """jusText/boilerpipe-lite: short nav and stopword-free word salad
    are boilerplate; prose and media survive."""
    from sparkcrawl.operators.multimodal import main_content_spans

    def t(text, off):
        return ("text", text, "", off)

    rows = [
        (1, [t("the quick value of the table is in the sort order", 0),
             t("home | about | contact", 1),           # short nav
             t("zzz qqq xxx www vvv uuu ttt sss", 2),   # no stopwords
             ("media", "", "img://1", 3)]),
        (2, [t("", 0)]),                                 # empty text span
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, spans array<struct<kind:string,text:string,"
              "media_ref:string,offset:int>>")
    got = {(r["doc_id"], r["span_offset"]): r
           for r in main_content_spans(docs).collect()}
    assert got[(1, 0)]["keep"] and got[(1, 0)]["n_words"] == 11
    assert not got[(1, 1)]["keep"]          # 4 words < 5
    assert not got[(1, 2)]["keep"]          # ratio 0 < 0.05
    assert got[(1, 3)]["keep"]              # media always kept
    assert not got[(2, 0)]["keep"] and got[(2, 0)]["n_words"] == 0
    # "the"x3 + "of" + "is" + "in" = 6 stopword hits of 11 words
    assert got[(1, 0)]["stop_ratio"] == round(6 / 11, 6)


def test_ann_recall_eval(spark):
    """Recall math recomputed by hand from two small result tables;
    perfect-recall and missing-query cases covered."""
    from sparkcrawl.operators import simsearch

    exact = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (2, 20, 1), (2, 21, 2), (3, 30, 1)],
        ["query_id", "cand_id", "rank"])
    approx = spark.createDataFrame(
        [(1, 10, 1), (1, 99, 2),          # 1/2 for query 1
         (2, 20, 1), (2, 21, 2)],          # 2/2 for query 2; query 3: 0/1
        ["query_id", "cand_id", "rank"])
    r = simsearch.ann_recall_eval(exact, approx).collect()[0]
    assert (r["n_queries"], r["sum_exact"], r["sum_hits"]) == (3, 5, 3)
    assert r["micro_recall"] == 0.6
    assert r["mean_recall"] == 0.5            # (0.5 + 1.0 + 0.0)/3
    assert r["min_recall"] == 0.0
    # identical tables -> everything 1.0
    p = simsearch.ann_recall_eval(exact, exact).collect()[0]
    assert p["micro_recall"] == p["mean_recall"] == p["min_recall"] == 1.0
    # k filter applies to both sides
    r1 = simsearch.ann_recall_eval(exact, approx, k=1).collect()[0]
    assert (r1["sum_exact"], r1["sum_hits"]) == (3, 2)


def test_real_jpeg_sof_decode(spark):
    """JPEG SOF marker-scan kernel over hand-built byte streams:
    baseline SOF0 behind APP0+DQT, progressive SOF2, fill bytes before
    a marker, DHT (0xC4) correctly NOT treated as a SOF, and the
    failure modes (SOS before SOF, truncation, wrong magic)."""
    import struct

    from sparkcrawl.operators import multimodal

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    def sof(marker, width, height):
        # precision(1) height(2) width(2) ncomp(1) + 1 comp spec (3)
        return seg(marker, b"\x08" + struct.pack(">HH", height, width)
                   + b"\x01" + b"\x01\x11\x00")

    app0 = seg(0xE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    dqt = seg(0xDB, b"\x00" + bytes(64))
    dht = seg(0xC4, b"\x00" + bytes(16) + bytes(4))
    soi = b"\xff\xd8"

    baseline = soi + app0 + dqt + sof(0xC0, 640, 480)
    progressive = soi + app0 + dht + sof(0xC2, 1920, 1080)
    fill = soi + b"\xff" + app0 + sof(0xC1, 12, 34)  # fill byte before APP0
    no_sof = soi + app0 + seg(0xDA, b"\x01\x01\x00\x00\x3f\x00")
    truncated = baseline[:20]

    assert multimodal.parse_jpeg_sof(baseline) == (640, 480)
    assert multimodal.parse_jpeg_sof(progressive) == (1920, 1080)
    assert multimodal.parse_jpeg_sof(fill) == (12, 34)
    assert multimodal.parse_jpeg_sof(no_sof) is None
    assert multimodal.parse_jpeg_sof(truncated) is None
    assert multimodal.parse_jpeg_sof(b"\x89PNGnope") is None
    assert multimodal.parse_jpeg_sof(b"") is None

    rows = [("c.jpg", baseline, "image", len(baseline)),
            ("d.jpg", progressive, "image", len(progressive))]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = {
        r["media_ref"]: (r["width"], r["height"], len(r["feature"]))
        for r in multimodal.decode_and_featurize(media, fake=False).collect()
    }
    assert got == {"c.jpg": (640, 480, 8), "d.jpg": (1920, 1080, 8)}


def test_caption_coverage(spark):
    """Coverage counts match the pair-miner's neighbor predicate:
    full / partial / zero coverage, empty-text exclusion, media-free
    docs NULL out — and the plan is a pure projection (no Generate /
    Join / Exchange)."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    from sparkcrawl.operators.multimodal import caption_coverage

    def t(text, off):
        return ("text", text, "", off)

    def m(off):
        return ("media", "", f"ref{off}", off)

    span_t = ("array<struct<kind:string,text:string,"
              "media_ref:string,offset:int>>")
    rows = [
        ("full", [t("intro", 0), m(1), t("cap", 2)]),
        ("half", [m(0), m(1), t("cap", 2)]),       # only media@1 in range
        ("none", [m(0), m(1)]),                     # no text at all
        ("emptytext", [m(0), t("", 1)]),            # empty text ignored
        ("textonly", [t("a", 0), t("b", 1)]),       # no media -> NULL
    ]
    df = spark.createDataFrame(rows, ["doc_id", "spans"]).withColumn(
        "spans", F.col("spans").cast(span_t))
    got = {r["doc_id"]: (r["n_media"], r["n_captioned"], r["coverage"])
           for r in caption_coverage(df).collect()}
    assert got["full"] == (1, 1, 1.0)
    assert got["half"] == (2, 1, 0.5)
    assert got["none"] == (2, 0, 0.0)
    assert got["emptytext"] == (1, 0, 0.0)
    assert got["textonly"] == (0, 0, None)

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        caption_coverage(df).explain("simple")
    p = buf.getvalue()
    for op in ("Generate", "Join", "Exchange", "BatchEvalPython"):
        assert op not in p, op


def test_span_sequence_audit(spark):
    """Contract audit: offset order, kind validity, payload
    consistency, per-span bad counts — and the plan is a pure
    projection (no Generate / Join / Exchange / Python)."""
    import contextlib
    import io

    from sparkcrawl.operators.multimodal import span_sequence_audit

    def t(text, off):
        return ("text", text, None, off)

    def m(ref, off):
        return ("media", None, ref, off)

    span_t = ("array<struct<kind:string,text:string,"
              "media_ref:string,offset:int>>")
    rows = [
        ("clean", [t("a", 0), m("r.png", 1)]),
        ("dup_off", [t("a", 0), m("r.png", 0)]),
        ("desc_off", [t("a", 2), m("r.png", 1)]),
        ("bad_kind", [("widget", None, None, 0), t("a", 1)]),
        ("text_with_ref", [("text", "a", "x.png", 0)]),
        ("media_with_text", [("media", "cap", "x.png", 0)]),
        ("ref_missing", [("media", None, None, 0)]),
        ("empty", []),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "spans"]).withColumn(
        "spans", F.col("spans").cast(span_t))
    got = {r["doc_id"]: r for r in span_sequence_audit(df).collect()}

    c = got["clean"]
    assert (c["offsets_strictly_increasing"], c["kinds_valid"],
            c["payloads_consistent"], c["n_bad_spans"], c["ok"]) == (
        True, True, True, 0, True)
    assert not got["dup_off"]["offsets_strictly_increasing"]
    assert not got["dup_off"]["ok"]
    assert got["dup_off"]["n_bad_spans"] == 0
    assert not got["desc_off"]["offsets_strictly_increasing"]
    bk = got["bad_kind"]
    assert (bk["kinds_valid"], bk["payloads_consistent"],
            bk["n_bad_spans"], bk["ok"]) == (False, False, 1, False)
    assert got["text_with_ref"]["n_bad_spans"] == 1
    assert not got["text_with_ref"]["payloads_consistent"]
    assert got["text_with_ref"]["kinds_valid"]
    assert got["media_with_text"]["n_bad_spans"] == 1
    assert got["ref_missing"]["n_bad_spans"] == 1
    e = got["empty"]
    assert (e["n_spans"], e["offsets_strictly_increasing"], e["ok"]) == (
        0, True, True)

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        span_sequence_audit(df).explain("simple")
    p = buf.getvalue()
    for op in ("Generate", "Join", "Exchange", "BatchEvalPython"):
        assert op not in p, op


def test_span_parity(spark):
    """Row-for-row (kind, text, media_ref, order) parity: match,
    value mismatch, length mismatch, missing sides, and offset-order
    insensitivity; the plan is ONE full-outer join with no Generate."""
    import contextlib
    import io

    from sparkcrawl.operators.multimodal import span_parity

    def t(text, off):
        return ("text", text, None, off)

    def m(ref, off):
        return ("media", None, ref, off)

    span_t = ("array<struct<kind:string,text:string,"
              "media_ref:string,offset:int>>")

    def df(rows):
        return spark.createDataFrame(rows, ["doc_id", "spans"]).withColumn(
            "spans", F.col("spans").cast(span_t))

    mine = df([
        ("same", [t("a", 0), m("r.png", 1)]),
        ("reordered", [t("a", 0), m("r.png", 1)]),
        ("valdiff", [t("a", 0), m("r.png", 1)]),
        ("longer_mine", [t("a", 0), m("r.png", 1), t("b", 2)]),
        ("only_mine", [t("a", 0)]),
    ])
    ref = df([
        ("same", [t("a", 0), m("r.png", 1)]),
        ("reordered", [m("r.png", 1), t("a", 0)]),   # same order key
        ("valdiff", [t("a", 0), m("r.pngx", 1)]),
        ("longer_mine", [t("a", 0), m("r.png", 1)]),
        ("only_ref", [m("q.png", 0)]),
    ])
    out = span_parity(mine, ref)
    got = {r["doc_id"]: r for r in out.collect()}

    assert got["same"]["status"] == "match" and got["same"]["equal"]
    assert got["same"]["first_mismatch_idx"] == 0
    assert got["reordered"]["status"] == "match"
    v = got["valdiff"]
    assert (v["status"], v["first_mismatch_idx"], v["equal"]) == (
        "mismatch", 2, False)
    lm = got["longer_mine"]
    assert (lm["n_mine"], lm["n_ref"], lm["first_mismatch_idx"],
            lm["status"]) == (3, 2, 3, "mismatch")
    om = got["only_mine"]
    assert (om["status"], om["n_ref"], om["first_mismatch_idx"]) == (
        "missing_ref", None, None)
    orf = got["only_ref"]
    assert (orf["status"], orf["n_mine"], orf["n_ref"]) == (
        "missing_mine", None, 1)

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("simple")
    p = buf.getvalue()
    assert "Generate" not in p
    assert "BatchEvalPython" not in p
    assert p.count("Join") >= 1 and "FullOuter" in p


def test_triplet_mining_semihard_band(spark):
    """Triplets derive from the SAME knn graph: positive = rank 1,
    negative = rank ``neg_rank``; margin >= 0 by construction; anchors
    without a rank-``neg_rank`` neighbor drop out."""
    import math

    import pytest as _pytest

    from sparkcrawl.operators._caching import release_caches
    from sparkcrawl.operators.simsearch import knn_graph, triplet_mining

    def unit(theta):
        return [math.cos(theta), math.sin(theta), 0.0, 0.0]

    # one 4-node cluster + one isolated pair (only 1 neighbor each at
    # best once bucketing splits the space)
    rows = [(j, unit(0.1 + 0.02 * j)) for j in range(4)]
    rows += [(10, unit(3.1)), (11, unit(3.12))]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kw = dict(n_planes=6, dim=4, seed=1, n_bands=3)
    g = {}
    for r in knn_graph(emb, k=3, **kw).collect():
        g.setdefault(r.src, {})[r.rank] = (r.dst, r.sim)
    release_caches()
    trips = {r.anchor: r for r in
             triplet_mining(emb, pos_rank=1, neg_rank=3, **kw).collect()}
    release_caches()
    # exactly the anchors owning a rank-3 neighbor produce a triplet
    assert set(trips) == {s for s, rk in g.items() if 3 in rk}
    assert trips  # the 4-cluster produces some
    for a, t in trips.items():
        assert (t.positive, t.pos_sim) == g[a][1]
        assert (t.negative, t.neg_sim) == g[a][3]
        assert t.margin == round(t.pos_sim - t.neg_sim, 6) and t.margin >= 0
    with _pytest.raises(ValueError):
        triplet_mining(emb, pos_rank=3, neg_rank=2, **kw)


def test_media_position_profile(spark):
    """Hand profile: 4-span docs with the image always at index 1 ->
    only bin floor(1*4/4)=2? no: floor(1*10/4)=2 holds the media; all
    other bins pure text; shares exact."""
    from sparkcrawl.operators.multimodal import media_position_profile

    def span(kind, off):
        return (kind, "t" if kind == "text" else None,
                "m.png" if kind != "text" else None, off)
    rows = []
    for d in range(6):
        rows.append((d, [span("text", 0), span("image", 1),
                         span("text", 2), span("text", 3)]))
    df = spark.createDataFrame(
        rows,
        "doc_id long, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>")
    got = {r["bin"]: r for r in media_position_profile(df).collect()}
    # indices 0,1,2,3 of n=4 -> bins 0, 2, 5, 7
    assert set(got) == {0, 2, 5, 7}
    assert got[2]["n_media"] == 6 and got[2]["media_share"] == 1.0
    for b in (0, 5, 7):
        assert got[b]["n_media"] == 0 and got[b]["n_spans"] == 6


def test_embedding_health(spark):
    """Counts a zero vector and a dead (constant) dimension; norms
    hand-checked on 3-4-5 triangles."""
    from sparkcrawl.operators.simsearch import embedding_health

    rows = [
        (0, [3.0, 4.0, 1.0]),
        (1, [0.0, 0.0, 0.0]),     # zero norm
        (2, [6.0, 8.0, 1.0]),     # dim 2 constant except row 1...
        (3, [3.0, 4.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    r = embedding_health(df).collect()[0]
    assert r["n_vectors"] == 4 and r["dim"] == 3
    assert r["n_zero_norm"] == 1
    assert r["n_dead_dims"] == 0   # dim 2 varies (the zero row)
    assert r["min_norm"] == 0.0
    assert r["max_abs"] == 8.0
    # now make dim 2 truly constant
    df2 = spark.createDataFrame(
        [(0, [3.0, 4.0, 1.0]), (1, [6.0, 8.0, 1.0])],
        "vec_id long, embedding array<double>")
    r2 = embedding_health(df2).collect()[0]
    assert r2["n_dead_dims"] == 1
    assert r2["mean_norm"] == round((
        (3 ** 2 + 4 ** 2 + 1) ** 0.5 + (6 ** 2 + 8 ** 2 + 1) ** 0.5) / 2, 6)


def test_ann_ndcg_eval(spark):
    """Hand-computed nDCG: perfect retrieval -> 1.0; swapping in a
    zero-gain candidate at rank 1 pushes the true top hit to rank 2
    and drops nDCG by exactly the discount ratio."""
    import math

    from sparkcrawl.operators.simsearch import ann_ndcg_eval

    exact = spark.createDataFrame(
        [(1, 10, 0.9, 1), (1, 11, 0.5, 2),
         (2, 20, 0.8, 1), (2, 21, 0.4, 2)],
        ["query_id", "cand_id", "sim", "rank"])
    approx = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2),          # perfect for q1
         (2, 99, 1), (2, 20, 2)],         # junk at rank 1 for q2
        ["query_id", "cand_id", "rank"])
    row = ann_ndcg_eval(exact, approx, k=2).collect()[0]
    idcg2 = 0.8 / math.log2(2) + 0.4 / math.log2(3)
    dcg2 = 0.8 / math.log2(3)             # true top hit demoted
    from decimal import ROUND_HALF_UP, Decimal

    half_up = lambda x: math.floor(x + 0.5)   # Spark/DuckDB rounding
    r6 = lambda x: float(Decimal(repr(x)).quantize(
        Decimal("1e-6"), ROUND_HALF_UP))      # Spark round(col, 6)
    assert row["n_queries"] == 2
    assert row["min_ndcg"] == r6(half_up(dcg2 * 1e6 / idcg2) / 1e6)
    assert row["mean_ndcg"] == r6(
        (1_000_000 + half_up(dcg2 * 1e6 / idcg2)) / 2 / 1e6)
    idcg1 = 0.9 / math.log2(2) + 0.5 / math.log2(3)
    assert row["micro_ndcg"] == round(
        (idcg1 + dcg2) / (idcg1 + idcg2), 6)


def test_ann_ndcg_negative_gain_clamped(spark):
    """Negative exact sims clamp to zero gain: a query whose entire
    exact pool is negative has IDCG 0 and drops out of the summary."""
    from sparkcrawl.operators.simsearch import ann_ndcg_eval

    exact = spark.createDataFrame(
        [(1, 10, 0.6, 1), (1, 11, -0.2, 2),
         (3, 30, -0.5, 1)],
        ["query_id", "cand_id", "sim", "rank"])
    approx = spark.createDataFrame(
        [(1, 11, 1), (1, 10, 2), (3, 30, 1)],
        ["query_id", "cand_id", "rank"])
    import math
    row = ann_ndcg_eval(exact, approx, k=2).collect()[0]
    assert row["n_queries"] == 1          # q3 excluded (IDCG 0)
    got = 1 / math.log2(3)                # 0.6/log2(3) over 0.6/log2(2)
    assert row["micro_ndcg"] == round(got, 6)


def test_pool_embeddings(spark):
    """Hand-checked mean and max pooling; component order preserved;
    singleton groups pass through (rounded)."""
    import pytest as _pt

    from sparkcrawl.operators.simsearch import pool_embeddings

    rows = [
        ("d1", [1.0, 2.0, 3.0]),
        ("d1", [3.0, 2.0, 1.0]),
        ("d2", [0.5, -0.5, 0.25]),
    ]
    df = spark.createDataFrame(rows, ["group_id", "embedding"])
    got = {r["group_id"]: r for r in pool_embeddings(df).collect()}
    assert got["d1"]["n_members"] == 2
    assert got["d1"]["embedding"] == [2.0, 2.0, 2.0]
    assert got["d2"]["embedding"] == [0.5, -0.5, 0.25]
    mx = {r["group_id"]: r
          for r in pool_embeddings(df, mode="max").collect()}
    assert mx["d1"]["embedding"] == [3.0, 2.0, 3.0]
    with _pt.raises(ValueError):
        pool_embeddings(df, mode="median")
