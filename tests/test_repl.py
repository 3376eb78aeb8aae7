"""REPL surface tests (§2.7 special commands, main.py:261-392)."""

from __future__ import annotations

import json

import pytest


@pytest.fixture(scope="module")
def repl(spark, tmp_path_factory):
    from searchengine_spark.repl import Repl

    d = tmp_path_factory.mktemp("corpus")
    docs = [
        ("pets1.txt", "cats jump high"),
        ("pets2.txt", "dogs run fast"),
        ("pets3.txt", "dogs and cats are pets"),
    ]
    for name, text in docs:
        (d / name).write_text(text)
    return Repl(spark, str(d))


def test_repl_index_and_boolean(repl):
    out = repl.handle("cats")
    assert out.endswith("2 documents")
    assert "pets1" in out and "pets3" in out


def test_repl_stem(repl):
    assert repl.handle(":stem running") == "run"
    assert repl.handle(":stem Hewlett-Packard") == "hewlettpackard hewlett packard"


def test_repl_vocab(repl):
    out = repl.handle(":vocab")
    assert "cat" in out.splitlines() and out.endswith("terms total")


def test_repl_style_and_formula_toggle(repl):
    assert repl.handle(":querystyle") == "query style: ranked"
    ranked_out = repl.handle("cats dogs")
    assert len(ranked_out.splitlines()) > 0  # scored lines
    assert repl.handle(":rankformula").startswith("rank formula:")
    assert repl.handle(":querystyle") == "query style: boolean"


def test_repl_quit(repl):
    assert repl.handle(":q") is None


def test_repl_author_search(spark, tmp_path):
    from searchengine_spark.repl import Repl

    for i, (author, body) in enumerate(
        [("smith", "alpha beta"), ("smyth", "gamma delta"), ("jones", "epsilon")]
    ):
        (tmp_path / f"d{i}.json").write_text(
            json.dumps({"title": f"T{i}", "body": body, "author": author})
        )
    r = Repl(spark, str(tmp_path), json_corpus=True)
    out = r.handle(":author smith")
    # smith and smyth share a soundex code; jones does not
    assert "smith" in out and "smyth" in out and "jones" not in out
