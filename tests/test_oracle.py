"""Oracle-engine goldens: positional index, boolean queries, biword, and
ranked scores — every assertion mirrors /root/reference/UnitTestingFramework.py
(via FIXTURES.md §3-4) on the utf_corpus pets fixture and dummytextfiles_2."""

import math

import pytest

from searchengine_spark.oracle.engine import (
    boolean_query_docs,
    build_index,
    phrase_query_docs,
    rank,
)

PETS = [
    (0, "cats jump high"),
    (1, "dogs run fast"),
    (2, "dogs and cats are pets"),
    (3, "pets should run and jump and play"),
    (4, "pets should have pets"),
    (5, "pets should play games"),
]

DUMMY2 = [
    (0, "cats jump high cats"),
    (1, "dogs run fast cats"),
]


@pytest.fixture(scope="module")
def pets_index():
    return build_index(PETS)


@pytest.fixture(scope="module")
def dummy2_index():
    return build_index(DUMMY2)


def test_positional_index_golden(pets_index):
    # petdict golden, UnitTestingFramework.py:20-33
    def pos(term):
        return [(d, p) for d, _, p in pets_index.get_postings(term)]

    assert pos("cat") == [(0, [1]), (2, [3])]
    assert pos("pet") == [(2, [5]), (3, [1]), (4, [1, 4]), (5, [1])]
    assert pos("and") == [(2, [2]), (3, [4, 6])]
    assert pos("dog") == [(1, [1]), (2, [1])]
    assert pos("should") == [(3, [2]), (4, [2]), (5, [2])]
    assert pos("run") == [(1, [2]), (3, [3])]
    assert pos("jump") == [(0, [2]), (3, [5])]
    assert pos("play") == [(3, [7]), (5, [3])]


BOOLEAN_GOLDENS = [
    # (query, expected #docs) — UnitTestingFramework.py:97-181 / FIXTURES.md §4
    ('"pets should play"', 1),
    ('"pets should run and jump and play"', 1),
    ("pets should play", 2),
    ("cat run", 0),
    ("pets should play run jump", 1),
    ("cats + dog + pet", 6),
    ("should + run + and", 5),
    ("rat + hamster + bird", 0),
    ("pets -should", 1),
    ("-run dogs", 1),
    ("should -jump -run", 2),
    ("cat -jump -dog", 0),
    ("should run + dogs", 3),
    ("cat + run -dogs", 3),
    ("cat + should + fast + run -dogs", 6),
    ("cat -dog -jump + dog -cat -fast + pets -should -are", 0),
    ("cat -dog -jump + dog -cat -fast + pets -should", 1),
]


@pytest.mark.parametrize("query,expected", BOOLEAN_GOLDENS)
def test_boolean_goldens(pets_index, query, expected):
    assert len(boolean_query_docs(pets_index, query)) == expected


def test_phrase_positional_path(pets_index):
    # force the positional-merge path (no biword rewrite)
    assert phrase_query_docs(pets_index, "pets should play") == [5]
    assert phrase_query_docs(pets_index, "pets should run and jump and play") == [3]


def test_biword_goldens(pets_index):
    # UnitTestingFramework.py:251-260 — 2-term phrases hit the biword index
    assert boolean_query_docs(pets_index, '"pets should"') == [3, 4, 5]
    assert boolean_query_docs(pets_index, '"dogs run"') == [1]


def test_near_query(pets_index):
    # [jump NEAR/2 play]: play pos - jump pos == 2 -> doc 3 (5, 7)
    assert boolean_query_docs(pets_index, "[jump NEAR/2 play]") == [3]
    assert boolean_query_docs(pets_index, "[cats NEAR/1 jump]") == [0]


RANKED_GOLDENS = [
    # (strategy, query, expected top score) UnitTestingFramework.py:262-324
    ("default", "cat", 0.5319866956),
    ("default", "dog run", 1.098612289),
    ("tfidf", "cat", 0.0),
    ("tfidf", "dog run", 0.6931471806),
    ("bm25", "cat", 0.1375),
    ("bm25", "dog run", 0.2),
    ("wacky", "cat", 0.0),
    ("wacky", "dog run", 0.0),
]


@pytest.mark.parametrize("strategy,query,expected", RANKED_GOLDENS)
def test_ranked_goldens(dummy2_index, strategy, query, expected):
    results = rank(dummy2_index, query, strategy=strategy, k=10)
    assert results, f"no results for {query}"
    top_score = results[0][0]
    assert math.isclose(top_score, expected, rel_tol=0, abs_tol=1e-8), (
        f"{strategy}({query}) -> {top_score} != {expected}"
    )


def test_rank_tiebreak_by_doc_id_desc(pets_index):
    # equal scores order by larger doc_id first (heapq tuple order,
    # main.py:463-467)
    results = rank(pets_index, "should", strategy="bm25", k=10)
    # docs 4 and 5 both have docLength 4 and tftd 1 -> identical scores;
    # the heap tuple order puts the larger doc_id first
    by_doc = {d: s for s, d in results}
    assert by_doc[4] == by_doc[5]
    i4 = [d for _, d in results].index(4)
    i5 = [d for _, d in results].index(5)
    assert i5 < i4


def test_hyphenated_rank_mode_last_part_wins(dummy2_index):
    # 'real-gas' in rank mode searches only 'gas'
    # (queries/termliteral.py:37-42); here 'jump-cats' -> only 'cat'
    r1 = rank(dummy2_index, "jump-cats", strategy="bm25", k=10)
    r2 = rank(dummy2_index, "cats", strategy="bm25", k=10)
    assert r1 == r2


def test_hyphenated_boolean_mode_fused(pets_index):
    # boolean mode uses the fused form: 'cats-jump' -> 'catsjump'
    # which does not exist -> no docs
    assert boolean_query_docs(pets_index, "cats-jump") == []
