"""BPE tokenizer training/encoding (operators/bpe.py) vs an independent
pure-Python reference implementation of the Sennrich algorithm."""

import re
from collections import Counter

from sparkcrawl.operators import bpe


def _ref_bpe_train(texts, num_merges, min_pair_count=2):
    """Independent reference: textbook BPE over a word-frequency table,
    same tie-break contract (count desc, left asc, right asc)."""
    words = Counter()
    for t in texts:
        for w in t.lower().split():
            if re.fullmatch(r"[a-zA-Z0-9_']+", w):
                words[w] += 1
    vocab = {w: list(w) + [bpe.END] for w in words}
    merges = []
    for rank in range(num_merges):
        pc = Counter()
        for w, n in words.items():
            syms = vocab[w]
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += n
        if not pc:
            break
        (l, r), c = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if c < min_pair_count:
            break
        merges.append((rank, l, r, c))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges


CORPUS = (
    ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
)


def test_bpe_train_matches_reference(spark):
    docs = spark.createDataFrame(
        [(1, " ".join(CORPUS))], ["doc_id", "text"])
    got = bpe.bpe_train(docs, num_merges=8)
    want = _ref_bpe_train([" ".join(CORPUS)], 8)
    assert got == want
    # sanity on the classic example: 'est</w>' forms within 2 merges
    joined = {l + r for _, l, r, _ in got}
    assert "es" in joined and "est" in joined


def test_bpe_train_multiline_and_filtering(spark):
    rows = [
        (1, "aaa aaa aaa bbb!!! ccc"),
        (2, "aaa ??? bbb aaa"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = bpe.bpe_train(docs, num_merges=4)
    want = _ref_bpe_train([r[1] for r in rows], 4)
    assert got == want
    # 'bbb!!!' and '???' never entered the vocab
    assert all("!" not in l + r and "?" not in l + r for _, l, r, _ in got)


def test_bpe_train_overlap_rule(spark):
    """'aaaa' under merge (a,a): left-to-right greedy gives
    [aa, aa, </w>] — the pair count for round 1 is 3 per word (four
    a's overlap), NOT 2x; round 2 ties (aa,aa) with (aa,</w>) at 3
    and the (left asc, right asc) tie-break picks (aa, '</w>')
    because '<' sorts before 'a'."""
    docs = spark.createDataFrame(
        [(1, "aaaa aaaa aaaa")], ["doc_id", "text"])
    got = bpe.bpe_train(docs, num_merges=2)
    want = _ref_bpe_train(["aaaa aaaa aaaa"], 2)
    assert got == want
    assert got[0] == (0, "a", "a", 9)  # 3 overlapping pairs x 3 words
    assert got[1] == (1, "aa", bpe.END, 3)


def test_bpe_encode_end_to_end(spark):
    train = spark.createDataFrame(
        [(1, " ".join(CORPUS))], ["doc_id", "text"])
    merges = bpe.bpe_train(train, num_merges=8)
    docs = spark.createDataFrame(
        [(10, "Lowest newest!!! punct-dropped low")], ["doc_id", "text"])
    out = {r["id"]: r for r in bpe.bpe_encode(docs, merges).collect()}
    toks = out[10]["tokens"]
    # per-word reference encode; 'newest!!!' and 'punct-dropped' are
    # skipped by the word-class gate (same class as training)
    ranks = {(l, r): k for k, l, r, _ in merges}
    want = bpe._encode_word("lowest", ranks) + bpe._encode_word("low", ranks)
    assert toks == want
    assert out[10]["n_tokens"] == len(want)


def test_bpe_train_df_shape(spark):
    docs = spark.createDataFrame([(1, "ab ab ab")], ["doc_id", "text"])
    df = bpe.bpe_train_df(docs, num_merges=3)
    rows = df.collect()
    assert df.columns == ["rank", "left", "right", "pair_count"]
    assert [r["rank"] for r in rows] == list(range(len(rows)))
