"""Byte-Pair-Encoding tokenizer training + encoding over the corpus.

BPE (Sennrich, Haddow & Birch, ACL 2016 — the subword scheme behind
GPT-2/RoBERTa-style tokenizers): start from characters, repeatedly
merge the most frequent adjacent symbol pair. A training-data engine
needs it twice: TRAIN a vocabulary on the corpus it just curated, and
ENCODE documents to count real subword tokens (the budget unit for
shard packing / mixture quotas, where whitespace counts mislead by
20-40% on non-English).

Spark-first shape:
  - Training runs on the distinct WORD-FREQUENCY table, not raw text
    (the classic reduction): one groupBy collapses a 100 TB corpus to
    a vocabulary-sized table, and every merge iteration is one
    pair-explode + one hash agg over THAT — corpus size only ever
    touches the first groupBy.
  - The argmax pair per iteration is a single collected row (bounded:
    num_merges scalar collects total); ties break deterministically by
    (count desc, left asc, right asc).
  - Applying a merge rewrites the symbol arrays with a pure
    higher-order ``aggregate`` fold (left-to-right greedy, matching
    reference BPE's overlap semantics) — JVM codegen, no Python.
  - Encoding broadcasts the (tiny) learned merge list and applies it
    in ONE Arrow pass (``mapInPandas``), memoizing per distinct word
    within each batch.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

END = "</w>"  # word-end marker: merges never cross word boundaries


def _word_symbol_table(
    docs: DataFrame, text_col: str, lowercase: bool
) -> DataFrame:
    """(word, n, syms) — distinct words with corpus frequencies and
    their initial character-symbol arrays (+ end marker)."""
    txt = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    words = (
        docs.select(F.explode(F.split(txt, r"\s+")).alias("word"))
        .filter(F.col("word").rlike(r"^[a-zA-Z0-9_']+$"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )
    return words.withColumn(
        "syms",
        F.concat(F.split(F.col("word"), ""), F.array(F.lit(END))),
    )


def _apply_merge(left: str, right: str) -> F.Column:
    """Left-to-right greedy single-pair merge of column ``syms`` as a
    pure fold — the reference BPE overlap rule ('aaa' under (a,a) ->
    [aa, a]). Symbols come from the word table, so the only escaping
    needed is the apostrophe the word regex admits."""
    l_lit = left.replace("'", "\\'")
    r_lit = right.replace("'", "\\'")
    return F.expr(
        f"""aggregate(syms,
            cast(array() as array<string>),
            (acc, x) -> if(size(acc) > 0
                           AND element_at(acc, -1) = '{l_lit}'
                           AND x = '{r_lit}',
                        concat(slice(acc, 1, size(acc) - 1),
                               array('{l_lit}{r_lit}')),
                        concat(acc, array(x))))"""
    )


def bpe_train(
    docs: DataFrame,
    num_merges: int = 10,
    text_col: str = "text",
    lowercase: bool = True,
    min_pair_count: int = 2,
) -> list[tuple[int, str, str, int]]:
    """Learn ``num_merges`` merges; returns [(rank, left, right,
    pair_count)] (rank 0 = first/highest-priority merge). Stops early
    when no pair reaches ``min_pair_count``.

    CONTRACT — driver-loop operator, like connected components: the
    training loop is Θ(num_merges) Spark jobs, ONE scalar argmax
    collect each, every job over the WORD-FREQUENCY table (vocab-
    sized, bounded by distinct words), never the corpus — at 100 TB
    only the initial groupBy in _word_symbol_table touches corpus
    rows. Intended for feature-extraction-sized merge lists (10s-100s
    of merges; benched at 100 merges / ~0.28 s per merge at sf0.1 on
    local[32], see bench.py bpe_train probe). A production 30-50k-
    merge tokenizer vocabulary would be driver-latency-bound here and
    belongs in a specialized trainer. Batched top-m-per-round variants
    are deliberately NOT offered: batch-applying even symbol-disjoint
    pairs can diverge from sequential BPE (a pair surviving merge k,
    or newly created by it, may outrank the batch's m-th pick), and
    this trainer's value is exact reference semantics — pytest-equal
    to an independent pure-Python reference and to the unrolled DuckDB
    oracle (_bpe_merges_sql)."""
    vocab = _word_symbol_table(docs, text_col, lowercase).localCheckpoint(
        eager=True
    )
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(num_merges):
        pairs = (
            vocab.select(
                "n",
                F.explode(
                    F.arrays_zip(
                        F.expr("slice(syms, 1, size(syms) - 1)"),
                        F.expr("slice(syms, 2, size(syms) - 1)"),
                    )
                ).alias("p"),
            )
            .groupBy(
                F.col("p.0").alias("left"), F.col("p.1").alias("right")
            )
            .agg(F.sum("n").alias("cnt"))
        )
        top = pairs.orderBy(
            F.desc("cnt"), F.asc("left"), F.asc("right")
        ).limit(1).collect()
        if not top or top[0]["cnt"] < min_pair_count:
            break
        left, right, cnt = top[0]["left"], top[0]["right"], top[0]["cnt"]
        merges.append((rank, left, right, int(cnt)))
        vocab = vocab.withColumn(
            "syms", _apply_merge(left, right)
        ).localCheckpoint(eager=True)
    return merges


def bpe_train_df(docs: DataFrame, num_merges: int = 10,
                 text_col: str = "text", lowercase: bool = True) -> DataFrame:
    """bpe_train as a DataFrame (rank, left, right, pair_count)."""
    merges = bpe_train(docs, num_merges, text_col, lowercase)
    schema = "rank int, left string, right string, pair_count bigint"
    return docs.sparkSession.createDataFrame(
        merges or [], schema=schema
    )


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Reference BPE encode: repeatedly merge the present pair with the
    best (lowest) learned rank until none applies."""
    syms = list(word) + [END]
    while len(syms) > 1:
        best, best_rank = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = (syms[i], syms[i + 1]), r
        if best is None:
            break
        out, i = [], 0
        while i < len(syms):
            if (
                i + 1 < len(syms)
                and (syms[i], syms[i + 1]) == best
            ):
                out.append(syms[i] + syms[i + 1])
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[int, str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
) -> DataFrame:
    """(id, tokens, n_tokens) — encode with a learned merge list
    (broadcast-small by construction) in one Arrow pass; per-word
    memoization inside each batch."""
    ranks = {(left, right): rank for rank, left, right, _ in merges}
    out_schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("tokens", T.ArrayType(T.StringType())),
        T.StructField("n_tokens", T.IntegerType()),
    ])
    cols = docs.select(
        F.col(id_col).cast("long").alias("id"),
        (F.lower(F.col(text_col)) if lowercase else F.col(text_col)).alias("t"),
    )

    def _enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}
        for b in batches:
            recs = []
            for i, t in zip(b["id"], b["t"]):
                toks: list[str] = []
                for wd in (t or "").split():
                    # same word class as training's rlike gate
                    if not re.fullmatch(r"[a-zA-Z0-9_']+", wd):
                        continue
                    if wd not in cache:
                        cache[wd] = _encode_word(wd, ranks)
                    toks.extend(cache[wd])
                recs.append((i, toks, len(toks)))
            yield pd.DataFrame(recs, columns=["id", "tokens", "n_tokens"])

    return cols.mapInPandas(_enc, out_schema)
