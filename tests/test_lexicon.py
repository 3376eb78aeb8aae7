"""Wildcard (k-gram index) and spelling-correction (deletion index)
operators — each checked against a brute-force twin over the same
vocabulary, plus the completeness invariants the indexes rely on."""

import re

import pytest
from pyspark.sql import functions as F

from searchengine_spark.queries import lexicon as L


@pytest.fixture(scope="module")
def vocab(spark):
    terms = [
        ("scan", 40), ("slow", 38), ("small", 35), ("sort", 30),
        ("spark", 28), ("stream", 25), ("strength", 3), ("row", 44),
        ("order", 20), ("filter", 19), ("customer", 18), ("key", 41),
        ("table", 39), ("a", 90), ("agg", 12), ("join", 50),
        ("x2y", 2), ("retrieval", 7), ("retrial", 6),
    ]
    return spark.createDataFrame(terms, "term string, df long").cache()


BRUTE_PATTERNS = [
    "s*",            # prefix
    "*er",           # suffix
    "s*t",           # mid star
    "st*m",          # mid star, both segments >= k
    "s*r*a*",        # multiple stars
    "a*",            # too short for any k-gram -> regex fallback
    "*",             # match-all
    "scan",          # no star: exact-term degenerate case
    "z*q",           # no match
    "retri*al",      # k-gram false-positive shape (retrial vs retrieval)
]


def _brute(vocab_rows, pattern):
    rx = re.compile(L.wildcard_regex(pattern))
    return sorted(t for t, _ in vocab_rows if rx.match(t))


def test_wildcard_matches_bruteforce(spark, vocab):
    rows = [(r["term"], r["df"]) for r in vocab.collect()]
    kg = L.kgram_index(vocab).cache()
    for pat in BRUTE_PATTERNS:
        got = sorted(r["term"] for r in L.expand_wildcard(
            vocab, pat, kgrams=kg).collect())
        assert got == _brute(rows, pat), pat


def test_wildcard_regex_escapes_metacharacters(spark):
    v = spark.createDataFrame(
        [("a.c", 1), ("abc", 2), ("axc", 3)], "term string, df long")
    # '.' in the pattern must be literal, not regex-any
    got = sorted(r["term"] for r in L.expand_wildcard(v, "a.*").collect())
    assert got == ["a.c"]


def test_kgram_index_shape(vocab):
    kg = L.kgram_index(vocab, k=3)
    rows = kg.collect()
    # every gram is length 3 and comes from its boundary-marked term
    for r in rows:
        assert len(r["kgram"]) == 3
        assert r["kgram"] in "$" + r["term"] + "$"
    # 'scan' -> $sc sca can an$ (4 distinct grams)
    assert sum(1 for r in rows if r["term"] == "scan") == 4


def test_wildcard_docs_equals_or_over_expansion(spark, vocab):
    docs = spark.createDataFrame(
        [(1, "scan the stream"), (2, "slow row"), (3, "filter order"),
         (4, "key table join")],
        "doc_id long, text string")
    from searchengine_spark.indexing.simple import build_simple_index

    idx = build_simple_index(docs)
    v = idx.postings.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    got = sorted(r["doc_id"] for r in L.wildcard_docs(
        idx.postings, v, "s*").collect())
    assert got == [1, 2]


# ---------------------------------------------------------------------------
# spelling correction
# ---------------------------------------------------------------------------

def _lev(a, b):
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute_correct(vocab_rows, q, max_edit=1):
    cands = [(t, df) for t, df in vocab_rows if _lev(q, t) <= max_edit]
    if not cands:
        return None
    cands.sort(key=lambda td: (_lev(q, td[0]), -td[1], td[0]))
    return cands[0][0]


def test_spell_correct_matches_bruteforce(vocab):
    rows = [(r["term"], r["df"]) for r in vocab.collect()]
    queries = ["scann", "tble", "sow", "spark", "zzz", "ket", "jion",
               "stream", "rw", "agg", "ordre", "retrial"]
    got = {r["query_term"]: r["suggestion"]
           for r in L.spell_correct(vocab, queries).collect()}
    for q in queries:
        assert got.get(q) == _brute_correct(rows, q), q


def test_deletion_keys_complete_for_distance_one():
    # the index-completeness invariant: any pair within levenshtein 1
    # shares a delete-0/1 variant key
    pairs = [("scan", "scann"), ("table", "tble"), ("row", "sow"),
             ("a", ""), ("abc", "abc"), ("abc", "abd"), ("abc", "ab")]
    for a, b in pairs:
        assert _lev(a, b) <= 1
        assert L._delete_variants_py(a) & L._delete_variants_py(b), (a, b)


def test_spell_correct_tie_breaks_on_df_then_term(spark):
    v = spark.createDataFrame(
        [("bat", 10), ("cat", 10), ("rat", 5)], "term string, df long")
    # 'aat' is distance 1 from all three; bat/cat tie on df -> 'bat'
    got = L.spell_correct(v, ["aat"]).collect()
    assert [(r["query_term"], r["suggestion"]) for r in got] == [("aat", "bat")]


def test_spell_correct_prefers_exact_match_over_frequent_neighbor(spark):
    v = spark.createDataFrame(
        [("scan", 5), ("scat", 500)], "term string, df long")
    got = L.spell_correct(v, ["scan"]).collect()
    assert got[0]["suggestion"] == "scan"  # distance 0 beats df 500


def test_spell_correct_rejects_unsupported_edit_distance(vocab):
    with pytest.raises(ValueError):
        L.spell_correct(vocab, ["x"], max_edit=2)


def test_suggest_prefix_orders_by_df_then_term(vocab):
    got = [(r["term"], r["df"]) for r in
           L.suggest_prefix(vocab, "s", n=3).collect()]
    rows = [(r["term"], r["df"]) for r in vocab.collect()]
    want = sorted((x for x in rows if x[0].startswith("s")),
                  key=lambda td: (-td[1], td[0]))[:3]
    assert got == want


def test_rank_wildcard_equals_rank_over_expanded_literals(spark):
    from searchengine_spark.indexing.simple import (
        build_simple_index,
        simple_query_term,
    )
    from searchengine_spark.queries.lexicon import rank_topk_wildcard
    from searchengine_spark.queries.ranked import rank_topk

    docs = spark.createDataFrame(
        [(1, "scan the stream slowly"), (2, "slow sort of stream"),
         (3, "scan scan small"), (4, "nothing here")],
        "doc_id long, text string")
    idx = build_simple_index(docs)
    v = idx.postings.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    got = rank_topk_wildcard(idx, v, "s*", "bm25", k=10).collect()
    lits = sorted(r["term"] for r in L.expand_wildcard(v, "s*").collect())
    want = rank_topk(idx, " ".join(lits), "bm25", 10,
                     normalize=simple_query_term).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == \
        [(r["doc_id"], r["score"]) for r in want]


def test_suggest_prefix_via_kgram_probe(vocab):
    # a 3-char prefix goes through the k-gram candidate path
    kg = L.kgram_index(vocab).cache()
    got = [r["term"] for r in
           L.suggest_prefix(vocab, "str", n=5, kgrams=kg).collect()]
    assert got == ["stream", "strength"]  # df 25 > 3
