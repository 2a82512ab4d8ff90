"""Registered-domain (eTLD+1) extraction — C9 (SURVEY §2.7).

The reference groups politeness queues by host; the north_star groups by
registered DOMAIN, so `a.shop.example.co.uk` and `b.shop.example.co.uk`
must share a politeness queue. That needs public-suffix knowledge: the
snapshot below is a minimal, bundled subset of the PUBLIC Public Suffix
List (publicsuffix.org, Mozilla-maintained public data) — the common
ICANN 1- and 2-label suffixes plus a few well-known private registries.
Semantics are the full PSL rule set: "longest matching suffix + one
label", including WILDCARD rules (``*.ck`` — any single label under the
base is itself a public suffix) and EXCEPTION rules (``!www.ck`` — the
named domain is registrable despite a covering wildcard; exceptions
take precedence, as in the PSL algorithm). The snapshot uses the PSL
file's own ``*.`` / ``!`` syntax, so a real deployment can swap in the
full publicsuffix.org list unchanged.

Everything is a pure column expression (exception when-branches + ONE
anchored alternation regex) — JVM-side, codegen'd, no UDF, no join;
and :func:`registered_domain_sql` emits the identical CASE chain for
the DuckDB oracle. Engine default stays HOST-based (cfg.use_public_suffix
= False) to pin the host-parity goldens; the flag turns this on.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# minimal snapshot of publicsuffix.org (public data); longest rules first
# at match time. 2-label ICANN suffixes + their 1-label parents + common
# private registries.
PUBLIC_SUFFIX_SNAPSHOT: tuple[str, ...] = (
    # wildcard + exception rules (PSL syntax; ICANN section)
    "*.ck", "!www.ck",
    "*.jm",
    "*.kawasaki.jp", "!city.kawasaki.jp",
    # private registries (PSL private section)
    "github.io", "gitlab.io", "blogspot.com", "herokuapp.com",
    "appspot.com", "s3.amazonaws.com", "cloudfront.net",
    # ICANN 2-label
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk", "sch.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp", "ad.jp",
    "com.br", "net.br", "org.br", "gov.br",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn",
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ac.in",
    "co.nz", "net.nz", "org.nz", "govt.nz",
    "co.za", "net.za", "org.za", "web.za",
    "co.kr", "or.kr", "ne.kr", "go.kr",
    "com.mx", "org.mx", "net.mx",
    "com.tr", "org.tr", "net.tr",
    "com.sg", "org.sg", "net.sg",
    # ICANN 1-label
    "com", "org", "net", "edu", "gov", "mil", "int", "io", "co", "ai",
    "uk", "de", "fr", "jp", "au", "br", "cn", "in", "nl", "se", "ch",
    "it", "es", "pl", "ru", "nz", "za", "kr", "mx", "tr", "sg", "us",
    "ca", "eu", "info", "biz", "dev", "app",
)

_IPV4 = r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$"
_LAST_TWO = r"([^.]+\.[^.]+)$"


def bundled_psl_path() -> str:
    """Path of the bundled ``public_suffix_list.dat`` snapshot
    (sparkcrawl/data/) — real publicsuffix.org file format (section
    comments, ``*.`` wildcards, ``!`` exceptions), 885 rules. The
    inline ``PUBLIC_SUFFIX_SNAPSHOT`` stays the ACTIVE default: it is
    the small hot-path set (the eTLD+1 alternation regex runs per URL
    in queue assignment, and the 885-rule pattern measures ~1.8x the
    per-row cost of the inline set for identical results on crawl
    traffic). Activate the file — or a full publicsuffix.org download,
    same syntax — with::

        set_public_suffix_rules(load_public_suffix_list(bundled_psl_path()))
    """
    import os

    return os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        os.pardir, "data", "public_suffix_list.dat")


def load_public_suffix_list(path: str) -> tuple[str, ...]:
    """Parse the REAL ``public_suffix_list.dat`` syntax (publicsuffix.org):
    ``//`` comment lines, blank lines, one rule per line (anything after
    the first whitespace is ignored, per the PSL wiki's parsing rules),
    ``*.``-wildcards and ``!``-exceptions verbatim. Returns the rules
    tuple in file order — feed it to :func:`set_public_suffix_rules` to
    make it the active rule set. A real deployment downloads the list
    once and ships it with ``--files``; the bundled snapshot stays the
    fallback so the sandbox needs no network."""
    rules: list[str] = []
    with open(path, encoding="utf-8") as f:
        for raw in f:
            line = raw.strip()
            if not line or line.startswith("//"):
                continue
            rules.append(line.split()[0].lower())
    return tuple(rules)


def _classify(rules: tuple[str, ...]) -> dict[str, tuple[str, ...]]:
    return {
        "exceptions": tuple(s[1:] for s in rules if s.startswith("!")),
        "wildcards": tuple(s[2:] for s in rules if s.startswith("*.")),
        "normal": tuple(s for s in rules if not s.startswith(("!", "*."))),
    }


# active rule classes; default = bundled snapshot, swappable via
# set_public_suffix_rules(load_public_suffix_list(path))
_ACTIVE: dict[str, tuple[str, ...]] = _classify(PUBLIC_SUFFIX_SNAPSHOT)


def set_public_suffix_rules(rules: tuple[str, ...] | None = None) -> None:
    """Swap the active PSL rule set (None = restore the bundled
    snapshot). Affects every subsequent registered_domain* call — the
    column expressions bake the rule set in at PLAN time, so call this
    before building the plan, not mid-query."""
    global _ACTIVE
    _ACTIVE = _classify(rules if rules is not None else PUBLIC_SUFFIX_SNAPSHOT)


def _ordered_exceptions() -> list[str]:
    """Exception rules, most-labels first (PSL: exceptions beat wildcards)."""
    return sorted(_ACTIVE["exceptions"], key=lambda s: (-s.count("."), -len(s), s))


def _ordered_rules() -> list[tuple[int, str]]:
    """(label_count, suffix_regex) longest-match order: normal suffixes
    are literal patterns; a wildcard base ``b`` contributes the pattern
    ``[^.]+\\.b`` (any ONE label under the base is itself a public
    suffix), counting one extra label."""
    rules = [
        (s.count(".") + 1, len(s), s.replace(".", r"\."))
        for s in _ACTIVE["normal"]
    ]
    rules += [
        (b.count(".") + 2, len(b) + 2, r"[^.]+\." + b.replace(".", r"\."))
        for b in _ACTIVE["wildcards"]
    ]
    rules.sort(key=lambda r: (-r[0], -r[1], r[2]))
    return [(r[0], r[2]) for r in rules]


def _suffix_alternation() -> str:
    """ONE anchored pattern `([^.]+\\.(?:s1|s2|...))$` covering every
    snapshot suffix (wildcard rules contribute `[^.]+\\.base`
    alternatives). Longest-suffix-wins falls out of match POSITION,
    not alternation order: the earliest start yielding a match consumes
    exactly one label + dot, and the remainder must EQUAL one suffix —
    so a host matching both `x.co.uk` and `uk` rules matches at the
    earlier (longer) position in any regex engine (leftmost match is
    common to Java regex and RE2). One regex eval per row instead of a
    |snapshot|-branch when-chain — the difference between 0.03s and
    3.5s per 100k hosts in the measured plan."""
    alts = "|".join(pat for _, pat in _ordered_rules())
    return r"([^.]+\.(?:" + alts + r"))$"


def registered_domain(host: Column) -> Column:
    """eTLD+1 of a lowercase host (longest suffix + one label; IPv4 and
    unmatched hosts fall back sanely). Exception rules resolve to their
    literal domain first (PSL: `!www.ck` is registrable, so any host at
    or under it registers as www.ck); everything else is the single
    alternation regex."""
    pat = _suffix_alternation()
    expr = F.when(host.rlike(_IPV4), host)
    for exc in _ordered_exceptions():
        expr = expr.when(
            (host == F.lit(exc)) | host.endswith(F.lit("." + exc)), F.lit(exc)
        )
    # regexp_extract returns "" on no-match and both capture groups are
    # non-empty by construction, so extract-once + ""-test halves the
    # regex evaluations vs rlike-then-extract (the alternation regex is
    # the whole cost of this function; measured on the c9 bench query).
    etld1 = F.regexp_extract(host, pat, 1)
    # unknown TLD: last two labels; single-label hosts stay themselves
    last2 = F.regexp_extract(host, _LAST_TWO, 1)
    return (
        expr.when(etld1 != "", etld1)
        .when(last2 != "", last2)
        .otherwise(host)
    )


def registered_domain_sql(col: str) -> str:
    """The DuckDB twin of :func:`registered_domain` — identical rule
    chain, for oracle queries."""
    pat = _suffix_alternation()
    exc_branches = "".join(
        f"WHEN ({col} = '{exc}' OR {col} LIKE '%.{exc}') THEN '{exc}' "
        for exc in _ordered_exceptions()
    )
    return (
        f"CASE WHEN regexp_matches({col}, '{_IPV4}') THEN {col} "
        f"{exc_branches}"
        f"WHEN regexp_matches({col}, '{pat}') "
        f"THEN regexp_extract({col}, '{pat}', 1) "
        f"WHEN regexp_matches({col}, '[^.]+\\.[^.]+$') "
        f"THEN regexp_extract({col}, '{_LAST_TWO}', 1) "
        f"ELSE {col} END"
    )


def registered_domain_py(host: str) -> str:
    """Plain-Python twin for the sequential simulator / tests —
    independent longest-suffix-first LOOP (not the alternation regex),
    so the fuzz test cross-checks two different implementations."""
    if re.match(_IPV4, host):
        return host
    for exc in _ordered_exceptions():
        if host == exc or host.endswith("." + exc):
            return exc
    for _, pat in _ordered_rules():
        m = re.search(r"([^.]+\." + pat + r")$", host)
        if m and (host == m.group(1) or host.endswith("." + m.group(1))):
            return m.group(1)
    m = re.search(_LAST_TWO, host)
    return m.group(1) if m else host
