#!/usr/bin/env python
"""Generate golden/mini_superstep_fetch_log.json with the INDEPENDENT
sequential simulator (tests/reference_sim.py) — the oracle rows for the
`crawl_mini_superstep` entry in __spark_entry__.py.

The entry runs the Spark engine on generate_web(seed=42, num_hosts=8,
pages_per_host=4) with CrawlConfig(num_queues=4) for 2 supersteps and
returns fetch_log (superstep, rank, url, outcome); this script derives
the same rows record-at-a-time, so the driver's DuckDB check compares
the distributed engine against the sequential parity spec.

Run from the repo root:  python scripts/gen_mini_superstep_golden.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def outcome_of(status: int | None) -> str:
    """Independent re-statement of the sink's outcome routing (S6/A3)."""
    if status == 200:
        return "success"
    if status == 304:
        return "not_modified"
    if status is not None and 300 <= status < 400:
        return "redirect"
    if status is not None and 400 <= status < 500:
        return "not_found"
    return "server_error"


def main() -> None:
    from reference_sim import SeqCrawler

    from sparkcrawl.config import CrawlConfig
    from sparkcrawl.sources.fixtures import generate_web

    web, robots, seeds = generate_web(seed=42, num_hosts=8, pages_per_host=4)
    cfg = CrawlConfig(num_queues=4, compact_every=0)
    sim = SeqCrawler(cfg, web, robots)
    sim.run(seeds, max_supersteps=2)
    rows = [
        [s, rank, url, outcome_of(status)]
        for s, rank, url, status in sim.fetch_log_full
    ]
    out = os.path.join(os.path.dirname(__file__), "..", "golden",
                       "mini_superstep_fetch_log.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"wrote {len(rows)} rows to {out}")


if __name__ == "__main__":
    main()
