"""Crawler-trap detection (operators/traps.py) + MIME sniffing."""

from pyspark.sql import functions as F

from sparkcrawl.operators import traps


def _urls(spark, urls):
    return spark.createDataFrame([(u,) for u in urls], ["url"])


def test_url_shape_features(spark):
    df = traps.url_trap_features(
        _urls(
            spark,
            [
                "http://h.example/a/a/a/x",
                "http://h.example/blog/post",
                "http://h.example/2024/01/03",
                "http://h.example/p?a=1&b=2&c=3",
                "http://h.example/",
                "http://h.example",
            ],
        )
    )
    rows = {r["url"]: r for r in df.collect()}
    r = rows["http://h.example/a/a/a/x"]
    assert (r["depth"], r["adjacent_repeats"], r["digit_runs"]) == (4, 2, 0)
    r = rows["http://h.example/blog/post"]
    assert (r["depth"], r["adjacent_repeats"], r["n_params"]) == (2, 0, 0)
    r = rows["http://h.example/2024/01/03"]
    assert (r["digit_runs"], r["host_template"]) == (3, "h.example/N/N/N")
    assert rows["http://h.example/p?a=1&b=2&c=3"]["n_params"] == 3
    for bare in ("http://h.example/", "http://h.example"):
        r = rows[bare]
        assert (r["depth"], r["adjacent_repeats"], r["n_params"]) == (0, 0, 0)


def test_template_fanout_flags_calendar_trap(spark):
    calendar = [
        f"http://trap.example/cal/{y}/{m:02d}/{d:02d}"
        for y in (2024, 2025) for m in range(1, 13) for d in range(1, 11)
    ]
    legit = [f"http://ok.example/article/{t}" for t in ("a", "b", "c")]
    out = traps.flag_traps(
        _urls(spark, calendar + legit), max_template_fanout=100
    )
    by_host = (
        out.withColumn("host", F.regexp_extract("url", "://([^/]+)", 1))
        .groupBy("host", "trap_suspect")
        .count()
        .collect()
    )
    verdict = {(r["host"], r["trap_suspect"]): r["count"] for r in by_host}
    assert verdict[("trap.example", True)] == len(calendar)
    assert verdict[("ok.example", False)] == len(legit)
    # all calendar URLs collapse to ONE template
    fan = traps.host_template_fanout(traps.url_trap_features(_urls(spark, calendar)))
    assert fan.count() == 1 and fan.first()["fanout"] == len(calendar)


def test_shape_traps_flagged_without_fanout(spark):
    out = traps.flag_traps(
        _urls(
            spark,
            [
                "http://h.example/a/a/a/x",        # adjacent repeats
                "http://h.example/" + "/".join("d%d" % i for i in range(15)),
                "http://h.example/p?" + "&".join(f"k{i}={i}" for i in range(10)),
                "http://h.example/fine/page",
            ],
        )
    )
    rows = {r["url"]: r["trap_suspect"] for r in out.collect()}
    assert sum(rows.values()) == 3
    assert rows["http://h.example/fine/page"] is False


def test_trap_plan_no_udf_single_agg_exchange(spark):
    """Features are pure codegen; the only shuffle is the template agg."""
    import contextlib
    import io
    import re

    df = traps.flag_traps(_urls(spark, ["http://h.example/a/b"]))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_sniff_mime_magic_bytes(spark):
    from sparkcrawl.operators.multimodal import sniff_mime

    payloads = [
        ("png", b"\x89PNG\r\n\x1a\x08888888888"),
        ("real_png", b"\x89PNG\r\n\x1a\n\x00\x00\x00\rIHDR"),
        ("jpeg", b"\xff\xd8\xff\xe0rest"),
        ("gif", b"GIF89a;;;"),
        ("pdf", b"%PDF-1.7 x"),
        ("gzip", b"\x1f\x8b\x08rest"),
        ("webp", b"RIFF\x00\x00\x00\x00WEBPVP8 "),
        ("wav", b"RIFF\x00\x00\x00\x00WAVEfmt "),
        ("mp3", b"ID3\x04tag"),
        ("webm", b"\x1aE\xdf\xa3webm"),
        ("mp4", b"\x00\x00\x00 ftypisom"),
        ("html", b"<!DOCTYPE html>"),
        ("other", b"plain text here"),
    ]
    df = spark.createDataFrame(payloads, ["name", "payload"])
    out = {
        r["name"]: r["mime"]
        for r in df.select("name", sniff_mime(F.col("payload")).alias("mime")).collect()
    }
    assert out["real_png"] == "image/png"
    assert out["png"] == "application/octet-stream"  # truncated magic: not PNG
    assert out["jpeg"] == "image/jpeg"
    assert out["gif"] == "image/gif"
    assert out["pdf"] == "application/pdf"
    assert out["gzip"] == "application/gzip"
    assert out["webp"] == "image/webp"
    assert out["wav"] == "audio/wav"
    assert out["mp3"] == "audio/mpeg"
    assert out["webm"] == "video/webm"
    assert out["mp4"] == "video/mp4"
    assert out["html"] == "text/html"
    assert out["other"] == "application/octet-stream"


def _web_row(url, body):
    return (url, 200, "text/html", None, None, None, body)


def test_engine_trap_gate(spark, mini_cfg, tmp_path):
    """Candidate-path trap suppression end-to-end: shape traps never
    enter the frontier; a mined template rule stops new instantiations
    mid-crawl (plans/traps.py -> superstep anti-join)."""
    import dataclasses

    from sparkcrawl.plans.superstep import CrawlRun
    from sparkcrawl.plans.traps import refresh_trap_rules
    from sparkcrawl.schemas import ROBOTS_SCHEMA, SEEDS_SCHEMA, WEB_SCHEMA

    cal_a = "".join(f'<a href="/cal/{i}/1">c</a>' for i in range(6))
    web = spark.createDataFrame(
        [
            _web_row(
                "http://t.example/",
                cal_a + '<a href="/x/x/x/deep">t</a><a href="/b">b</a>',
            ),
            _web_row(
                "http://t.example/b",
                "".join(f'<a href="/cal/{i}/2">c</a>' for i in range(20, 24))
                + '<a href="/fine">f</a>',
            ),
        ],
        schema=WEB_SCHEMA,
    )
    robots = spark.createDataFrame([], schema=ROBOTS_SCHEMA)
    seeds = spark.createDataFrame([("http://t.example/", 1)], schema=SEEDS_SCHEMA)

    cfg = dataclasses.replace(
        mini_cfg, filter_traps=True, trap_max_template_fanout=3
    )
    wd = str(tmp_path / "w")
    run = CrawlRun(spark, wd, cfg, web, robots)
    run.run(seeds, max_supersteps=1)

    urls1 = {r["url"] for r in run.frontier.read(spark).collect()}
    assert "http://t.example/x/x/x/deep" not in urls1  # shape gate
    assert "http://t.example/b" in urls1
    assert sum("/cal/" in u for u in urls1) == 6  # below shape thresholds

    n = refresh_trap_rules(spark, wd, cfg, refresh_id=1)
    assert n == 1  # the /cal/N/N template (fanout 6 > 3)

    run.resume(max_supersteps=1)
    urls2 = {r["url"] for r in run.frontier.read(spark).collect()}
    assert "http://t.example/fine" in urls2
    # page b's 4 NEW /cal/N/N links were suppressed by the mined rule
    assert sum("/cal/" in u for u in urls2) == 6

    # control: without the gate the same crawl admits the trap space
    cfg_off = dataclasses.replace(cfg, filter_traps=False)
    run2 = CrawlRun(spark, str(tmp_path / "w2"), cfg_off, web, robots)
    run2.run(seeds, max_supersteps=2)
    urls_off = {r["url"] for r in run2.frontier.read(spark).collect()}
    assert "http://t.example/x/x/x/deep" in urls_off
    assert sum("/cal/" in u for u in urls_off) == 10
