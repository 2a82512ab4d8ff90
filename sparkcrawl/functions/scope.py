"""Scope filter — F2 (src/spyder/processor/scoper.py::RegexScoper).

Keep a link iff it matches at least one positive regex and no negative
regex. Kept as a vectorized pandas UDF because the reference compiles
Python ``re`` patterns and Java's regex dialect differs (SURVEY F2) —
byte parity of the kept-URL set matters for the seen-set golden.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def scope_filter_udf(positive: tuple[str, ...], negative: tuple[str, ...]):
    pos_src, neg_src = list(positive), list(negative)

    @F.pandas_udf(T.BooleanType())
    def _in_scope(urls: pd.Series) -> pd.Series:
        pos = [re.compile(p) for p in pos_src]
        neg = [re.compile(p) for p in neg_src]

        def ok(u: str | None) -> bool:
            if u is None:
                return False
            if pos and not any(p.search(u) for p in pos):
                return False
            return not any(n.search(u) for n in neg)

        return urls.map(ok)

    return _in_scope


def in_scope(url: Column, positive: tuple[str, ...], negative: tuple[str, ...]) -> Column:
    return scope_filter_udf(positive, negative)(url)
