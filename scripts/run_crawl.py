#!/usr/bin/env python
"""spark-submit entry point for a crawl run (SURVEY M7).

    spark-submit --master <master> \
        --py-files dist/sparkcrawl.zip \
        scripts/run_crawl.py \
        --workdir /data/crawl1 --seeds /data/seeds.parquet \
        [--web /fixtures/web.parquet --robots /fixtures/robots.parquet] \
        [--generate-fixtures N_HOSTS] [--max-supersteps K] [--resume]

With --web, fetches resolve against the fixture table (sandbox / test
clusters); without it the engine would use the live-HTTP fetch path
(sparkcrawl.sources.fetch.http_fetch — no egress in this sandbox).
The session comes from spark-submit's master; only job args live here.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--seeds")
    ap.add_argument("--web")
    ap.add_argument("--robots")
    ap.add_argument("--generate-fixtures", type=int, default=0,
                    help="synthesize a mini-web with N hosts instead of --web/--robots")
    ap.add_argument("--max-supersteps", type=int, default=10)
    ap.add_argument("--num-queues", type=int, default=64)
    ap.add_argument("--per-queue-budget", type=int, default=50)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--use-public-suffix", action="store_true",
                    help="group politeness queues by eTLD+1 (C9) instead of host")
    ap.add_argument("--budget-carry", action="store_true",
                    help="carry unused per-queue budget across supersteps (A2)")
    ap.add_argument("--fetch-robots", action="store_true",
                    help="live robots.txt discovery: defer unknown hosts one "
                         "superstep while /robots.txt is fetched+parsed (R1)")
    ap.add_argument("--robots-ttl", type=int, default=0,
                    help="re-fetch robots.txt after N supersteps (0 = never)")
    ap.add_argument("--filter-traps", action="store_true",
                    help="gate candidate links through the crawler-trap "
                         "shape filter + mined template rules")
    ap.add_argument("--record-link-graph", action="store_true",
                    help="record host->host link edges for the offline "
                         "PageRank priority refresh (plans/rank.py)")
    ap.add_argument("--warc-archive",
                    help="archive-while-crawling: write each superstep's "
                         "fetched pages as WARC shards under this dir")
    ap.add_argument("--vacuum-every", type=int, default=0,
                    help="reclaim superseded store delta dirs every N "
                         "supersteps (0 = off); checkpoint-pinned "
                         "snapshots always survive")
    ap.add_argument("--dust-rules", metavar="PARQUET",
                    help="mined DUST-rules parquet from a prior "
                         "generation's --mine-dust: discovered links are "
                         "rewritten by the top rules before dedup/fetch")
    ap.add_argument("--mine-dust", metavar="OUT",
                    help="after the crawl leg, mine DUST URL-alias rewrite "
                         "rules (DustBuster WWW'07) from the WARC archive's "
                         "(url, payload-digest) captures and write them as "
                         "parquet to OUT; requires --warc-archive")
    ap.add_argument("--politeness-by-ip", action="store_true",
                    help="slot fetch batches by resolved IP so co-hosted "
                         "virtual hosts share one delay sequence "
                         "(IRLbot/Heritrix behavior)")
    ap.add_argument("--host-ip", metavar="PARQUET",
                    help="(host, ip) mapping for --politeness-by-ip, e.g. "
                         "exported from the DNS cache; unmapped hosts fall "
                         "back to a deterministic synthetic IP")
    ap.add_argument("--focus-terms",
                    help="comma list of topic terms: after the crawl (or "
                         "resume) leg, run the focused-crawl relevance "
                         "refresh (plans/relevance.py) so the NEXT --resume "
                         "leg schedules on-topic hosts first")
    ap.add_argument("--report", default="",
                    help="comma list of post-run reports, each printed as "
                         "JSON lines: 'saturation' (per-superstep novelty/"
                         "yield curve from the checkpoint log), 'drain' "
                         "(per-host politeness drain estimate over the "
                         "pending frontier), 'starvation' (per-queue "
                         "backlog aging at the last checkpoint clock), "
                         "'sitemap-coverage' (declared-vs-seen per host; "
                         "requires --sitemap-locs)")
    ap.add_argument("--sitemap-locs", metavar="PARQUET",
                    help="(loc) table of sitemap <loc> entries for "
                         "--report sitemap-coverage (e.g. exported from "
                         "operators/extract.py::sitemap_entries)")
    ap.add_argument("--rebalance-queues", type=int, default=0,
                    help="target queue-pool size for --report rebalance "
                         "(HRW-vs-mod migration counts from the current "
                         "num_queues to this)")
    ap.add_argument("--report-limit", type=int, default=100,
                    help="row cap for the per-host reports (drain, "
                         "sitemap-coverage), worst-first — keeps the "
                         "driver collect bounded on a big frontier")
    args = ap.parse_args()

    spark = SparkSession.builder.appName("sparkcrawl-run").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from sparkcrawl.config import CrawlConfig
    from sparkcrawl.plans.superstep import CrawlRun

    cfg = CrawlConfig(
        num_queues=args.num_queues,
        active_queues=min(args.num_queues, 8),
        per_queue_budget=args.per_queue_budget,
        use_public_suffix=args.use_public_suffix,
        budget_carry=args.budget_carry,
        fetch_robots=args.fetch_robots,
        robots_ttl_supersteps=args.robots_ttl,
        filter_traps=args.filter_traps,
        record_link_graph=args.record_link_graph,
        warc_archive_dir=args.warc_archive,
        vacuum_every=args.vacuum_every,
        dust_rules_file=args.dust_rules,
        politeness_by_ip=args.politeness_by_ip,
        host_ip_file=args.host_ip,
    )

    if args.generate_fixtures:
        from sparkcrawl.sources.fixtures import write_fixture_tables

        paths = write_fixture_tables(
            spark, args.workdir + "/fixtures", num_hosts=args.generate_fixtures
        )
        web = spark.read.parquet(paths["web"])
        robots = spark.read.parquet(paths["robots"])
        seeds = spark.read.parquet(paths["seeds"])
    else:
        web = spark.read.parquet(args.web) if args.web else None
        robots = spark.read.parquet(args.robots) if args.robots else None
        seeds = spark.read.parquet(args.seeds) if args.seeds else None

    run = CrawlRun(spark, args.workdir, cfg, web, robots)
    if args.resume:
        stats = run.resume(max_supersteps=args.max_supersteps)
    else:
        stats = run.run(seeds, max_supersteps=args.max_supersteps)
    for s in stats:
        print(json.dumps({
            "superstep": s.superstep, "batch": s.batch_size, "fetched": s.fetched,
            "denied": s.denied, "discovered": s.discovered, "new": s.new_urls,
            "pending": s.pending_after, "seen": s.seen_total,
        }))
    if args.mine_dust:
        if not args.warc_archive:
            raise SystemExit("--mine-dust requires --warc-archive")
        from pyspark.sql import functions as F

        from sparkcrawl.operators.dust import mine_dust_rules
        from sparkcrawl.sources.warc import cdx_index

        idx = cdx_index(spark, args.warc_archive)
        rules = mine_dust_rules(
            idx.select(F.col("original").alias("url"),
                       F.col("digest").alias("content_key"))
        )
        rules.write.mode("overwrite").parquet(args.mine_dust)
        n = spark.read.parquet(args.mine_dust).count()
        print(json.dumps({"dust_rules": n}))
    if args.report:
        from pyspark.sql import functions as F

        from sparkcrawl.operators.schedule import (
            politeness_drain_estimate,
            queue_starvation_report,
        )
        from sparkcrawl.plans.analytics import crawl_saturation, sitemap_coverage

        wanted = [w.strip() for w in args.report.split(",") if w.strip()]
        known = {"saturation", "drain", "starvation", "sitemap-coverage",
                 "token-yield", "fairness", "rebalance", "dup-rate",
                 "value-steering", "reciprocity", "soft404",
                 "scheme-migration", "param-entropy"}
        unknown = set(wanted) - known
        if unknown:
            raise SystemExit(f"unknown --report kinds: {sorted(unknown)} "
                             f"(known: {sorted(known)})")

        def emit(name, df):
            for r in df.collect():
                print(json.dumps({"report": name, **r.asDict()}, default=str))

        last = run.checkpoints.last()
        frontier = run.frontier.read(spark)
        if "saturation" in wanted:
            ckpt = run.checkpoints.read(spark)
            if ckpt is not None:
                emit("saturation",
                     crawl_saturation(ckpt).orderBy("superstep"))
        if "drain" in wanted and frontier is not None:
            emit("drain", politeness_drain_estimate(frontier, cfg, run._delays)
                 .orderBy(F.desc("drain_seconds"), "host")
                 .limit(args.report_limit))
        if "starvation" in wanted and frontier is not None and last:
            emit("starvation",
                 queue_starvation_report(frontier, last["virtual_time"])
                 .orderBy("queue"))
        value_reports = {"token-yield", "dup-rate", "value-steering"}
        if value_reports & set(wanted):
            # crawl-value accounting from the documents table alone:
            # doc_id IS the fetched url; span volume proxies fetched
            # bytes, whitespace tokens over text spans are the usable
            # training-token count (A2 budget-steering signals)
            from sparkcrawl.functions.domains import registered_domain
            from sparkcrawl.plans.analytics import (
                crawl_value_weights,
                domain_dup_rate,
                domain_token_yield,
            )

            docs = run.documents.read(spark)
            if docs is not None:
                spans = F.col("spans")
                host = F.lower(F.regexp_extract(
                    F.col("doc_id"), r"^[a-z][a-z0-9+.-]*://([^/?#]+)", 1))
                text = F.concat_ws(
                    " ",
                    F.transform(
                        F.filter(spans, lambda s: s["kind"] == F.lit("text")),
                        lambda s: s["text"]))
                n_bytes = F.aggregate(
                    spans, F.lit(0).cast("bigint"),
                    lambda acc, s: acc + F.length(s["text"])
                    + F.length(s["media_ref"]))
                fetched = docs.select(
                    registered_domain(host).alias("domain"),
                    n_bytes.alias("n_bytes"),
                    F.size(F.filter(
                        F.split(text, r"\s+"), lambda t: t != F.lit(""))
                    ).cast("bigint").alias("n_tokens"))
                dup_in = docs.select(
                    F.col("doc_id"),
                    registered_domain(host).alias("domain"),
                    text.alias("text"))
                if "token-yield" in wanted:
                    emit("token_yield",
                         domain_token_yield(fetched)
                         .orderBy(F.desc("budget_weight"), "domain")
                         .limit(args.report_limit))
                if "dup-rate" in wanted:
                    emit("dup_rate",
                         domain_dup_rate(dup_in)
                         .orderBy(F.desc("dup_rate"), "domain")
                         .limit(args.report_limit))
                if "value-steering" in wanted:
                    emit("value_steering",
                         crawl_value_weights(domain_token_yield(fetched),
                                             domain_dup_rate(dup_in))
                         .orderBy(F.desc("weight"), "domain")
                         .limit(args.report_limit))
        if "fairness" in wanted:
            # Jain index + top-share per superstep over the committed
            # fetch log: the W2/W3/A2 regression canary
            from sparkcrawl.functions.urlnorm import host_of_canonical_col
            from sparkcrawl.operators.schedule import fetch_fairness
            from sparkcrawl.sources.store import FetchLogTable

            log = FetchLogTable(args.workdir).read(spark)
            if log is not None:
                emit("fairness",
                     fetch_fairness(log.select(
                         "superstep",
                         host_of_canonical_col(F.col("url")).alias("host")))
                     .orderBy("superstep"))
        if "rebalance" in wanted:
            if args.rebalance_queues <= 0:
                raise SystemExit(
                    "--report rebalance requires --rebalance-queues N")
            if frontier is not None:
                from sparkcrawl.operators.schedule import (
                    queue_rebalance_report,
                )

                emit("rebalance",
                     queue_rebalance_report(
                         frontier.select("url_hash"),
                         cfg.num_queues, args.rebalance_queues)
                     .orderBy("strategy", "old_queue", "new_queue"))
        if "reciprocity" in wanted:
            # link-exchange rings over the recorded host link graph
            from sparkcrawl.operators.graph import reciprocity_stats
            from sparkcrawl.sources.store import LinkEdgesTable

            edges = LinkEdgesTable(args.workdir).read(spark)
            if edges is None:
                raise SystemExit(
                    "--report reciprocity requires a workdir crawled "
                    "with --record-link-graph")
            emit("reciprocity",
                 reciprocity_stats(edges.select(
                     F.col("src_host").alias("src"),
                     F.col("dst_host").alias("dst")))
                 .orderBy(F.desc("reciprocal_share"), "host")
                 .limit(args.report_limit))
        if "soft404" in wanted:
            # phrase-lane soft-404s over the stored documents (doc_id
            # IS the fetched url; every stored doc answered 200; no
            # per-host probes in a live workdir: length lane stays off)
            from sparkcrawl.operators.health import soft404_flags

            docs = run.documents.read(spark)
            if docs is not None:
                spans = F.col("spans")
                text = F.concat_ws(
                    " ",
                    F.transform(
                        F.filter(spans, lambda s: s["kind"] == F.lit("text")),
                        lambda s: s["text"]))
                pages = docs.select(
                    F.lower(F.regexp_extract(
                        F.col("doc_id"),
                        r"^[a-z][a-z0-9+.-]*://([^/?#]+)", 1)).alias("host"),
                    F.col("doc_id").alias("url"),
                    F.lit(200).alias("status"),
                    F.length(text).alias("body_len"),
                    text.alias("text"))
                emit("soft404",
                     soft404_flags(pages).filter("soft404")
                     .orderBy("host", "url").limit(args.report_limit))
        if "scheme-migration" in wanted and frontier is not None:
            from sparkcrawl.operators.mirrors import scheme_migration_report

            emit("scheme_migration",
                 scheme_migration_report(frontier.select("url"))
                 .orderBy(F.desc("https_share"), "host")
                 .limit(args.report_limit))
        if "param-entropy" in wanted and frontier is not None:
            from sparkcrawl.operators.dust import param_value_entropy

            emit("param_entropy",
                 param_value_entropy(frontier.select("url"))
                 .orderBy(F.desc("entropy_nats"), "host", "param")
                 .limit(args.report_limit))
        if "sitemap-coverage" in wanted:
            if not args.sitemap_locs:
                raise SystemExit(
                    "--report sitemap-coverage requires --sitemap-locs")
            if frontier is not None:
                locs = spark.read.parquet(args.sitemap_locs)
                emit("sitemap_coverage",
                     sitemap_coverage(locs, frontier.select("url"))
                     .orderBy("coverage", "host").limit(args.report_limit))
    if args.focus_terms:
        from sparkcrawl.plans.relevance import refresh_relevance_priorities

        terms = tuple(t.strip() for t in args.focus_terms.split(",") if t.strip())
        n = refresh_relevance_priorities(
            spark, args.workdir, cfg, terms,
            refresh_id=stats[-1].superstep if stats else 0,
        )
        print(json.dumps({"relevance_refresh_rows": n}))


if __name__ == "__main__":
    main()
