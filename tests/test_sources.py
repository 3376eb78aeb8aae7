"""Directory-corpus source tests: the utf_corpus pets fixture
(FIXTURES.md §3) materialized as real files, loaded via
sources/directory.py, indexed, and checked against the reference
boolean goldens (FIXTURES.md §4, UnitTestingFramework.py:97-181)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

PETS = {
    "pets1.txt": "cats jump high",
    "pets2.txt": "dogs run fast",
    "pets3.txt": "dogs and cats are pets",
    "pets4.txt": "pets should run and jump and play",
    "pets5.txt": "pets should have pets",
    "pets6.txt": "pets should play games",
}

BOOLEAN_GOLDENS = [
    ('"pets should play"', 1),
    ("pets should play", 2),
    ("cat run", 0),
    ("cats + dog + pet", 6),
    ("should + run + and", 5),
    ("rat + hamster + bird", 0),
    ("pets -should", 1),
    ("-run dogs", 1),
    ("should -jump -run", 2),
    ("cat -jump -dog", 0),
    ("should run + dogs", 3),
    ("cat + run -dogs", 3),
]


@pytest.fixture(scope="module")
def pets_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("utf_corpus")
    for name, text in PETS.items():
        (d / name).write_text(text)
    return str(d)


@pytest.fixture(scope="module")
def pets_docs(spark, pets_dir):
    from searchengine_spark.sources.directory import load_text_directory

    return load_text_directory(spark, pets_dir).cache()


def test_text_directory_ids_and_titles(pets_docs):
    rows = {r["doc_id"]: r for r in pets_docs.collect()}
    assert len(rows) == 6
    assert rows[0]["title"] == "pets1" and rows[0]["text"] == "cats jump high"
    assert rows[5]["title"] == "pets6"
    assert rows[3]["byte_size"] == len(PETS["pets4.txt"])


def test_boolean_goldens_via_directory_source(spark, pets_docs):
    from searchengine_spark.indexing.build import build_index
    from searchengine_spark.queries.engine import boolean_query

    idx = build_index(pets_docs, byte_size_col="byte_size").cache()
    for query, expected in BOOLEAN_GOLDENS:
        got = boolean_query(idx, query).count()
        assert got == expected, f"{query!r}: {got} != {expected}"


def test_json_directory(spark, tmp_path):
    from searchengine_spark.sources.directory import load_json_directory

    docs = [
        {"title": "First Doc", "body": "alpha beta gamma", "author": "smith",
         "url": "http://x/1"},
        {"title": "Second Doc", "body": "delta epsilon", "author": "jones",
         "url": "http://x/2"},
    ]
    for i, d in enumerate(docs):
        (tmp_path / f"doc{i}.json").write_text(json.dumps(d))
    df = load_json_directory(spark, str(tmp_path))
    rows = {r["doc_id"]: r for r in df.collect()}
    assert rows[0]["title"] == "First Doc"
    assert rows[0]["text"] == "alpha beta gamma"
    assert rows[1]["author"] == "jones"
    assert rows[1]["url"] == "http://x/2"


def test_json_directory_without_optional_keys(spark, tmp_path):
    from searchengine_spark.sources.directory import load_json_directory

    (tmp_path / "a.json").write_text(json.dumps({"title": "T", "body": "b c d"}))
    df = load_json_directory(spark, str(tmp_path))
    r = df.collect()[0]
    assert r["author"] is None and r["url"] is None and r["text"] == "b c d"


def test_empty_directory(spark, tmp_path):
    from searchengine_spark.sources.directory import load_text_directory

    assert load_text_directory(spark, str(tmp_path)).count() == 0
