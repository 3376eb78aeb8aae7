"""Head-to-head single-node throughput: the REFERENCE engine's own
in-memory indexing loop (its actual classes from /root/reference,
executed read-only) vs this Spark engine, on the same corpus.

The reference's `porter2stemmer` dependency isn't installed (no pip in
this sandbox), so a stub module backed by our Porter2 implementation
(`text/porter2.py` — same algorithm) is injected; everything else that
runs is the reference's own code (EnglishTokenStream,
NewTokenProcessor, PositionalInvertedIndex, DirectoryCorpus), driven by
a transcription of its indexing loop (/root/reference/main.py:142-217).

Usage: python tools/reference_benchmark.py [n_docs]
Prints one JSON line; paste results into BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def make_corpus_dir(n_docs: int) -> str:
    from searchengine_spark.corpus import make_page

    d = tempfile.mkdtemp(prefix="refbench_")
    for i in range(n_docs):
        p = make_page(i)
        with open(os.path.join(d, f"doc{i:06d}.txt"), "w") as fh:
            fh.write(p["text"])
    return d


def install_porter2_stub() -> None:
    import types

    from searchengine_spark.text.porter2 import stem

    mod = types.ModuleType("porter2stemmer")

    class Porter2Stemmer:
        def stem(self, word: str) -> str:
            return stem(word)

    mod.Porter2Stemmer = Porter2Stemmer
    sys.modules["porter2stemmer"] = mod


def pairwise(iterable):
    import itertools

    a, b = itertools.tee(iterable)
    next(b, None)
    return zip(a, b)


def run_reference(corpus_dir: str) -> dict:
    """Time the reference engine's own tokenize+index loop."""
    install_porter2_stub()
    sys.path.insert(0, "/root/reference")
    from documents.directorycorpus import DirectoryCorpus
    from indexes.positionalinvertedindex import PositionalInvertedIndex
    from text.englishtokenstream import EnglishTokenStream
    from text.newtokenprocessor import NewTokenProcessor

    corpus = DirectoryCorpus.load_text_directory(corpus_dir, ".txt")
    t0 = time.time()
    index = PositionalInvertedIndex()
    processor = NewTokenProcessor()
    n_docs = 0
    # transcription of the reference indexing loop (main.py:142-217):
    # pairwise over the token stream, index current token's terms at the
    # current 1-based position, trailing loop for the final token
    for doc in corpus:
        n_docs += 1
        stream = EnglishTokenStream(doc.get_content())
        position = 1
        next_terms: list = []
        for current, nxt in pairwise(stream):
            current_terms = processor.process_token(current)
            next_terms = processor.process_token(nxt)
            for term in current_terms:
                index.add_term(term, position, doc.id)
            position += 1
        for term in next_terms:
            index.add_term(term, position, doc.id)
    wall = time.time() - t0
    n_terms = len(index.vocabulary()) if hasattr(index, "vocabulary") else len(index._dictionary)
    return {"wall_s": round(wall, 2), "docs_per_sec": round(n_docs / wall, 1),
            "n_docs": n_docs, "vocab": n_terms}


def run_spark(corpus_dir: str, cores: int = 32) -> dict:
    from searchengine_spark.indexing.build import build_index
    from searchengine_spark.session import get_spark
    from searchengine_spark.sources.directory import load_text_directory

    spark = get_spark("ref-vs-spark", cores=cores)
    docs = load_text_directory(spark, corpus_dir)
    n = docs.count()  # warm the listing/scan
    t0 = time.time()
    idx = build_index(docs, byte_size_col="byte_size", persist=True)
    idx.postings.count()
    idx.doc_stats.count()
    wall = time.time() - t0
    vocab = idx.postings.select("term").distinct().count()
    spark.stop()
    return {"wall_s": round(wall, 2), "docs_per_sec": round(n / wall, 1),
            "n_docs": n, "vocab": vocab}


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    corpus_dir = make_corpus_dir(n_docs)
    try:
        spark_res = run_spark(corpus_dir)
        ref_res = run_reference(corpus_dir)
        assert ref_res["vocab"] == spark_res["vocab"], (
            "vocabulary mismatch — engines disagree on tokenization: "
            f"{ref_res['vocab']} vs {spark_res['vocab']}"
        )
        print(json.dumps({
            "n_docs": n_docs,
            "reference_single_thread": ref_res,
            "spark_local32": spark_res,
            "speedup": round(spark_res["docs_per_sec"] / ref_res["docs_per_sec"], 2),
        }))
    finally:
        shutil.rmtree(corpus_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
