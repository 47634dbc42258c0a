"""Independent Python-reference check for unigram_tokenize_viterbi: the
registered query's SQL DP (Spark HOF fold / DuckDB unrolled stages) must
reproduce a straightforward Python Viterbi over the same corpus, and the
segmentations must satisfy the lexicographic objective (fewest pieces,
then maximum total piece frequency)."""

import re
from collections import Counter

from spark_sql_flow_plugin_spark.operators.text import (
    _BPE_WORD_RE,
    _UNI_K,
    _UNI_L,
    _UNI_M,
    _UNI_P,
)
from spark_sql_flow_plugin_spark.registry import queries
from spark_sql_flow_plugin_spark.sources import load


def _py_reference(texts):
    vocab = Counter()
    for t in texts:
        for w in t.lower().split():
            if re.fullmatch(_BPE_WORD_RE.strip("^$"), w) and len(w) <= _UNI_L:
                vocab[w] += 1
    piece_occ = Counter()
    for w, n in vocab.items():
        for i in range(len(w)):
            for k in range(1, _UNI_K + 1):
                if i + k <= len(w):
                    piece_occ[w[i : i + k]] += n
    multi = sorted(
        (p for p in piece_occ if len(p) >= 2),
        key=lambda p: (-piece_occ[p], p),
    )[:_UNI_P]
    pieces = {p: piece_occ[p] for p in multi}
    pieces.update({p: piece_occ[p] for p in piece_occ if len(p) == 1})

    tok_counts = Counter()
    for w, n in vocab.items():
        best = [0] + [None] * len(w)
        back = [None] * (len(w) + 1)
        for i in range(1, len(w) + 1):
            for k in range(1, min(_UNI_K, i) + 1):
                p = w[i - k : i]
                if p in pieces and best[i - k] is not None:
                    c = best[i - k] + _UNI_M - pieces[p]
                    if best[i] is None or c < best[i]:
                        best[i] = c
                        back[i] = k
        assert best[len(w)] is not None, w  # single chars guarantee cover
        pos = len(w)
        while pos > 0:
            k = back[pos]
            tok_counts[w[pos - k : pos]] += n
            pos -= k
    return tok_counts


def test_unigram_viterbi_matches_python_dp(spark, sf_dir):
    df = queries()["unigram_tokenize_viterbi"](spark, sf_dir)
    got = {r["token"]: r["cnt"] for r in df.collect()}
    texts = [
        r["text"]
        for r in load(spark, sf_dir, "documents")["documents"]
        .select("text")
        .collect()
    ]
    want = _py_reference(texts)
    assert got == dict(want)


def test_unigram_viterbi_costs_are_optimal_for_planted_word(spark, sf_dir):
    """Every emitted segmentation minimizes piece count first: no word may
    use two pieces where an in-vocabulary single piece covers it (the
    corpus's whole short words are themselves top-frequency pieces)."""
    df = queries()["unigram_tokenize_viterbi"](spark, sf_dir)
    toks = {r["token"] for r in df.collect()}
    texts = [
        r["text"]
        for r in load(spark, sf_dir, "documents")["documents"]
        .select("text")
        .collect()
    ]
    want = _py_reference(texts)
    # words <= _UNI_K chars whose full form made the piece list segment
    # as themselves (fewest-pieces dominance)
    whole = {t for t in want if len(t) <= _UNI_K}
    assert whole <= toks
