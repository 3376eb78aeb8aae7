"""Interactive REPL — the Spark rebuild of the reference's driver
surface (/root/reference/main.py:237-392, special commands :261-392):

  :index <dir>      rebuild the index over a .txt/.json directory (T1)
  :stem <token>     print the Porter2 stem(s) via NewTokenProcessor
  :vocab            first 1000 sorted terms + vocabulary size
  :author <name>    Soundex author search (C5)
  :querystyle       toggle boolean | ranked
  :rankformula      cycle default | tfidf | bm25 | wacky
  :q                quit
  anything else     run as a query in the current style

Usage: ``python -m searchengine_spark.repl <corpus_dir> [--json]``
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame, functions as F

from .indexing.build import SparkIndex, build_index
from .queries.engine import boolean_query
from .queries.ranked import STRATEGIES, rank_topk
from .text.tokenizer import process_token, soundex


class Repl:
    def __init__(self, spark, corpus_dir: str, json_corpus: bool = False):
        self.spark = spark
        self.query_style = "boolean"
        self.rank_formula = "bm25"
        self.docs: DataFrame | None = None
        self.index: SparkIndex | None = None
        self.local = None
        if corpus_dir:
            self.cmd_index(corpus_dir, json_corpus)

    # ---- special commands (main.py:261-392) ----

    def cmd_index(self, path: str, json_corpus: bool | None = None) -> str:
        from .sources.directory import load_json_directory, load_text_directory

        if json_corpus is None:
            import os

            json_corpus = any(
                n.endswith(".json") for n in os.listdir(path)
            )
        loader = load_json_directory if json_corpus else load_text_directory
        self.docs = loader(self.spark, path).cache()
        self.index = build_index(
            self.docs, byte_size_col="byte_size", persist=True
        ).cache()
        n = self.docs.count()
        # Interactive fast path: collect small indexes into the
        # in-process reference-semantics engine once (~reference-grade
        # per-query latency instead of Spark's fixed job overhead);
        # large corpora stay on the distributed plans.
        from .queries.local import IndexTooLargeError, LocalQueryCache

        try:
            self.local = LocalQueryCache(self.index)
            mode = "local fast path"
        except IndexTooLargeError:
            self.local = None
            mode = "distributed"
        return f"indexed {n} documents from {path} ({mode})"

    def cmd_stem(self, token: str) -> str:
        return " ".join(process_token(token))

    def cmd_vocab(self) -> str:
        terms = [
            r["term"]
            for r in self.index.postings.select("term")
            .distinct().orderBy("term").limit(1000).collect()
        ]
        total = self.index.postings.select("term").distinct().count()
        return "\n".join(terms) + f"\n{total} terms total"

    def cmd_author(self, name: str) -> str:
        """Soundex author search (SoundexIndexer.py:40-45): match
        authors whose soundex equals the query's, return their docs."""
        if self.docs is None or "author" not in self.docs.columns:
            return "no author field in this corpus"
        code = soundex(name.lower())
        sx = F.pandas_udf(
            lambda s: s.map(lambda a: soundex(str(a).lower()) if a else ""),
            "string",
        )
        hits = (
            self.docs.filter(F.col("author").isNotNull())
            .withColumn("sx", sx("author"))
            .filter(F.col("sx") == code)
            .select("doc_id", "title", "author")
            .orderBy("doc_id")
            .collect()
        )
        return "\n".join(f"{r['doc_id']}\t{r['title']}\t{r['author']}" for r in hits) or "no matches"

    # ---- queries ----

    def run_query(self, q: str) -> str:
        if self.index is None:
            return "no index loaded — use :index <dir>"
        titles = {r["doc_id"]: r["title"] for r in self.docs.select("doc_id", "title").collect()} \
            if "title" in self.docs.columns else {}
        local = getattr(self, "local", None)
        if self.query_style == "boolean":
            if local is not None:
                ids = local.boolean(q)
            else:
                ids = [r["doc_id"] for r in boolean_query(self.index, q).collect()]
            lines = [f"{d}\t{titles.get(d, '')}" for d in ids]
            return "\n".join(lines) + f"\n{len(ids)} documents"
        if local is not None:
            ranked = local.rank_topk(q, self.rank_formula, 10)
        else:
            ranked = [
                (r["doc_id"], r["score"])
                for r in rank_topk(self.index, q, self.rank_formula, 10).collect()
            ]
        return "\n".join(
            f"{d}\t{titles.get(d, '')}\t{s:.9f}" for d, s in ranked
        )

    def handle(self, line: str) -> str | None:
        line = line.strip()
        if not line:
            return ""
        if line == ":q":
            return None
        if line.startswith(":index "):
            return self.cmd_index(line[7:].strip())
        if line.startswith(":stem "):
            return self.cmd_stem(line[6:].strip())
        if line == ":vocab":
            return self.cmd_vocab()
        if line.startswith(":author "):
            return self.cmd_author(line[8:].strip())
        if line == ":querystyle":
            self.query_style = "ranked" if self.query_style == "boolean" else "boolean"
            return f"query style: {self.query_style}"
        if line == ":rankformula":
            i = STRATEGIES.index(self.rank_formula)
            self.rank_formula = STRATEGIES[(i + 1) % len(STRATEGIES)]
            return f"rank formula: {self.rank_formula}"
        return self.run_query(line)


def main() -> None:  # pragma: no cover - interactive
    from .session import get_spark

    corpus = sys.argv[1] if len(sys.argv) > 1 else ""
    spark = get_spark("searchengine-repl")
    repl = Repl(spark, corpus, json_corpus="--json" in sys.argv)
    while True:
        try:
            line = input("search> ")
        except EOFError:
            break
        out = repl.handle(line)
        if out is None:
            break
        print(out)


if __name__ == "__main__":
    main()
