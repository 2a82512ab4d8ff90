"""Deterministic mini-web fixture generator (FIXTURES.md A3-A5, seed=42).

Synthesizes the fetchable ``web`` table, robots rules, and seed list —
the sandbox stand-in for live HTTP (SURVEY S4: "synthetic fetch =
broadcast-join the fetch batch against a deterministic web fixture").

Everything is derived from ``random.Random(seed)`` only: same seed →
byte-identical fixture → reproducible goldens.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta, timezone

import pandas as pd

T0 = datetime(2026, 1, 1, 0, 0, 0, tzinfo=timezone.utc)

_WORDS = (
    "crawl frontier spark queue politeness robots span media fetch link "
    "host domain priority schedule batch shuffle partition bloom hash seed"
).split()


def _page_url(host: str, page: int) -> str:
    return f"http://{host}/page/{page}"


def generate_web(
    seed: int = 42,
    num_hosts: int = 20,
    pages_per_host: int = 8,
    hot_hosts: int = 2,
    hot_factor: int = 10,
) -> tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame]:
    """Build (web, robots, seeds) pandas frames.

    Link targets include relative paths, absolute URLs, session-id and
    fragment noise (exercises C1/F3/F4); bodies interleave text and
    <img> media (exercises C5); a status mix of 200/301/404/500 plus
    etags for 304s (exercises C8/T4).
    """
    rng = random.Random(seed)
    hosts = [f"host{h:03d}.example" for h in range(num_hosts)]
    page_counts = {
        h: pages_per_host * (hot_factor if i < hot_hosts else 1)
        for i, h in enumerate(hosts)
    }
    all_pages = [(h, p) for h in hosts for p in range(page_counts[h])]

    rows = []
    for host, page in all_pages:
        url = _page_url(host, page)
        roll = rng.random()
        if roll < 0.06:
            status, body, location = 404, None, None
        elif roll < 0.10:
            status, body, location = 500, None, None
        elif roll < 0.16:
            status, body = 301, None
            th, tp = rng.choice(all_pages)
            location = _page_url(th, tp)
        else:
            status, location = 200, None
            body = _render_page(rng, host, page, all_pages, page_counts)
        rows.append(
            {
                "url": url,
                "status_code": status,
                "content_type": "text/html; charset=utf-8" if status == 200 else None,
                "location": location,
                "etag": f'"{host}-{page}-v1"' if status == 200 else None,
                "last_modified": T0 - timedelta(days=rng.randint(1, 300)),
                "body": body,
            }
        )
    web = pd.DataFrame(rows)

    robots = _generate_robots(rng, hosts)
    seed_hosts = rng.sample(hosts, min(10, len(hosts)))
    seeds = pd.DataFrame(
        {
            "url": [_page_url(h, 0) for h in seed_hosts],
            "priority": [1] * len(seed_hosts),
        }
    )
    return web, robots, seeds


def _render_page(rng, host, page, all_pages, page_counts) -> str:
    parts = [f"<html><head><title>{host} page {page}</title></head><body>"]
    if rng.random() < 0.15:
        parts.append(f'<base href="http://{host}/section/">')
    n_blocks = rng.randint(1, 6)
    for _ in range(n_blocks):
        words = " ".join(rng.choice(_WORDS) for _ in range(rng.randint(3, 12)))
        parts.append(f"<p>{words}</p>")
        r = rng.random()
        if r < 0.30:  # media span
            parts.append(f'<img src="/static/img{rng.randint(0, 99)}.png">')
        if r < 0.75:  # a link: relative / absolute / noisy
            th, tp = rng.choice(all_pages)
            target = _page_url(th, tp)
            style = rng.random()
            if style < 0.3 and th == host:
                href = f"/page/{tp}"
            elif style < 0.4:
                href = f"{target};jsessionid={rng.randint(10**8, 10**9)}"
            elif style < 0.5:
                href = f"{target}#frag{rng.randint(0, 9)}"
            elif style < 0.6:
                href = f"{target}?sid={rng.randint(1000, 9999)}"
            else:
                href = target
            parts.append(f'<a href="{href}">{rng.choice(_WORDS)}</a>')
    parts.append("</body></html>")
    return "".join(parts)


def _generate_robots(rng, hosts) -> pd.DataFrame:
    """A4: a fully-disallowed host, partial path disallows, crawl-delays,
    and hosts with no entry (allow-all default)."""
    rows = []
    for i, host in enumerate(hosts):
        if i == 1:  # fully disallowed host
            rows.append(dict(host=host, agent="*", allow=False,
                             path_prefix="/", crawl_delay=None))
        elif i % 5 == 2:  # partial disallow
            rows.append(dict(host=host, agent="*", allow=False,
                             path_prefix="/page/1", crawl_delay=None))
            rows.append(dict(host=host, agent="*", allow=True,
                             path_prefix="/", crawl_delay=None))
        elif i % 5 == 3:  # crawl-delay host
            rows.append(dict(host=host, agent="*", allow=True,
                             path_prefix="/", crawl_delay=float(rng.choice([2, 5]))))
        # else: no robots entry -> allow-all default
    return pd.DataFrame(rows, columns=["host", "agent", "allow", "path_prefix", "crawl_delay"])


def write_fixture_tables(spark, out_dir: str, seed: int = 42, **kw) -> dict[str, str]:
    """Materialize fixtures as parquet; returns table -> path."""
    from sparkcrawl.schemas import ROBOTS_SCHEMA, SEEDS_SCHEMA, WEB_SCHEMA

    web, robots, seeds = generate_web(seed=seed, **kw)
    paths = {}
    for name, pdf, schema in (
        ("web", web, WEB_SCHEMA),
        ("robots", robots, ROBOTS_SCHEMA),
        ("seeds", seeds, SEEDS_SCHEMA),
    ):
        path = f"{out_dir}/{name}.parquet"
        spark.createDataFrame(pdf, schema=schema).write.mode("overwrite").parquet(path)
        paths[name] = path
    return paths
