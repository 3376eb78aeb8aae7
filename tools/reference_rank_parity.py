"""Direct rank-identity check against the REFERENCE IMPLEMENTATION:
build the reference's own disk index (DiskIndexWriter → postings.bin +
SQLite offsets + docWeights.bin), run its four ranked strategies
(ranked_strategy.py) through its DiskPositionalIndex read path, and
compare top-k (title, score) lists against this Spark engine on the
same corpus — closing the loop that pytest's transcribed oracle leaves
open (the transcription itself could be wrong; the reference's actual
code cannot).

The indexing driver loop + per-doc stats below transcribe
/root/reference/main.py:142-217 verbatim (that logic lives inside the
reference's interactive main, which cannot be imported without
triggering stdin reads); every IR data structure, codec, disk format,
SQLite lookup, tokenizer, and scoring formula executed on the
reference side IS the reference's own code.

Usage: python tools/reference_rank_parity.py [n_docs]
Prints one JSON line: per-strategy parity + latency comparison.
"""

from __future__ import annotations

import heapq
import itertools
import json
import shutil
import statistics
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")

from tools.reference_benchmark import install_porter2_stub, make_corpus_dir  # noqa: E402

QUERIES = [
    "camping in yosemite",
    "the national park",
    "search engine index",
    "whaling devils postpile",
    "strenuous historical bedford",
    "query ranking retrieval",
]

BOOLEAN_QUERIES = [
    "camping yosemite",               # AND
    "whaling + bedford",              # OR
    "camping -yosemite",              # AND-NOT
    "national park + search engine -index",  # mixed
    '"national park"',                # phrase (biword fast path)
    "[camping NEAR/2 yosemite]",      # NEAR/k
]
STRATEGY_NAMES = ("default", "tfidf", "bm25", "wacky")
K = 10


def pairwise(iterable):
    a, b = itertools.tee(iterable)
    next(b, None)
    return zip(a, b)


def build_reference_disk_index(corpus_dir: str, index_dir: str):
    """main.py:142-217 transcription driving the reference's classes."""
    from math import sqrt

    from documents.directorycorpus import DirectoryCorpus
    from indexes.invertedindex import InvertedIndex
    from indexes.positionalinvertedindex import PositionalInvertedIndex
    from numpy import log as ln
    from text.englishtokenstream import EnglishTokenStream
    from text.newtokenprocessor import NewTokenProcessor

    corpus = DirectoryCorpus.load_text_directory(corpus_dir, ".txt")
    token_processor = NewTokenProcessor()
    index = PositionalInvertedIndex()
    biword_index = InvertedIndex()
    document_weights, doc_lengths, byte_sizes, average_tftds = [], [], [], []
    total_tokens = 0
    id_to_title = {}
    n_docs = 0
    for d in corpus:
        n_docs += 1
        id_to_title[d.id] = d.get_file_name() if hasattr(d, "get_file_name") else d.title
        term_tftd: dict = {}
        stream = EnglishTokenStream(d.get_content())
        doc_len = 0
        position = 1
        next_terms: list = []
        for current, nxt in pairwise(stream):
            current_terms = token_processor.process_token(current)
            next_terms = token_processor.process_token(nxt)
            for term in current_terms:
                term_tftd[term] = term_tftd.get(term, 0) + 1
                index.add_term(term=term, position=position, doc_id=d.id)
            for t1, t2 in zip(current_terms, next_terms):
                biword_index.add_term(term=t1 + " " + t2, doc_id=d.id)
            position += 1
            doc_len += 1
        for term in next_terms:
            term_tftd[term] = term_tftd.get(term, 0) + 1
            index.add_term(term=term, position=position, doc_id=d.id)
        doc_len += 1

        ld = sqrt(sum((1 + ln(tftd)) ** 2 for tftd in term_tftd.values()))
        document_weights.append(ld)
        doc_lengths.append(doc_len)
        total_tokens += doc_len
        average_tftds.append(
            sum(term_tftd.values()) / len(term_tftd) if term_tftd else 0
        )
        byte_sizes.append(d.get_file_size())

    avg_tokens = total_tokens / n_docs

    from diskindexwriter import DiskIndexWriter

    writer = DiskIndexWriter(
        Path(index_dir),
        document_weights=document_weights,
        docLengthd=doc_lengths,
        byteSized=byte_sizes,
        average_tftd=average_tftds,
        document_tokens_length_average=avg_tokens,
    )
    writer.write_index(index)

    biword_dir = Path(index_dir) / "biword"
    biword_dir.mkdir()
    biword_writer = DiskIndexWriter(biword_dir)
    biword_writer.write_index(biword_index)

    from indexes.diskpositionalindex import DiskPositionalIndex

    return (
        DiskPositionalIndex(writer, num_docs=n_docs),
        DiskPositionalIndex(biword_writer),
        n_docs,
        id_to_title,
    )


def reference_rank(disk_index, n_docs: int, query: str, strategy: str):
    import ranked_strategy as rs

    strat = {
        "default": rs.DefaultStrategy,
        "tfidf": rs.TraditionalStrategy,
        "bm25": rs.OkapiBM25Strategy,
        "wacky": rs.WackyStrategy,
    }[strategy]()
    acc = strat.calculate(query=query, disk_index=disk_index, corpus_size=n_docs)
    return heapq.nlargest(K, [(score, doc_id) for doc_id, score in acc.items()])


def reference_boolean(disk_index, biword_disk_index, query: str, id_to_title):
    """main.py:403-426 boolean path via the reference's own parser +
    merge code (biword fast path for single 2-term phrases)."""
    from queries import BooleanQueryParser, PhraseLiteral
    from text.newtokenprocessor import NewTokenProcessor

    parser = BooleanQueryParser()
    component = parser.parse_query(query=query)
    if isinstance(component, PhraseLiteral) and len(component.terms) == 2:
        postings = component.get_postings(
            biword_disk_index, NewTokenProcessor(), is_biword=True
        )
    else:
        postings = component.get_postings(disk_index, NewTokenProcessor())
    return sorted({id_to_title[p.doc_id] for p in postings})


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
    corpus_dir = make_corpus_dir(n_docs)
    index_dir = tempfile.mkdtemp(prefix="refdiskidx_")
    out: dict = {"n_docs": n_docs, "k": K, "queries": len(QUERIES)}
    try:
        # ---- Spark side ----
        from pyspark.sql import functions as F

        from searchengine_spark.indexing.build import build_index
        from searchengine_spark.queries.ranked import rank_topk
        from searchengine_spark.session import get_spark
        from searchengine_spark.sources.directory import load_text_directory

        spark = get_spark("rank-parity", cores=8)
        docs = load_text_directory(spark, corpus_dir)
        sidx = build_index(docs, byte_size_col="byte_size", persist=True).cache()
        sidx.postings.count()
        titles = {r["doc_id"]: r["title"]
                  for r in docs.select("doc_id", "title").collect()}
        spark_results: dict = {}
        spark_lat: list = []
        for strategy in STRATEGY_NAMES:
            for q in QUERIES:
                t0 = time.time()
                rows = rank_topk(sidx, q, strategy, K).collect()
                spark_lat.append(time.time() - t0)
                spark_results[(strategy, q)] = sorted(
                    (titles[r["doc_id"]], round(r["score"], 9)) for r in rows
                )
        from searchengine_spark.queries.engine import boolean_query

        spark_bool = {
            q: sorted(
                titles[r["doc_id"]]
                for r in boolean_query(sidx, q).collect()
            )
            for q in BOOLEAN_QUERIES
        }
        spark.stop()

        # ---- reference side (its own code end to end) ----
        install_porter2_stub()
        sys.path.insert(0, "/root/reference")
        disk_index, biword_disk_index, n, id_to_title = build_reference_disk_index(
            corpus_dir, index_dir
        )
        bool_mismatches = []
        for q in BOOLEAN_QUERIES:
            ref_docs = reference_boolean(disk_index, biword_disk_index, q,
                                         id_to_title)
            if ref_docs != spark_bool[q]:
                bool_mismatches.append(
                    {"query": q, "ref_n": len(ref_docs),
                     "spark_n": len(spark_bool[q])}
                )
        out["boolean_identical"] = not bool_mismatches
        out["boolean_mismatches"] = bool_mismatches
        ref_lat: list = []
        mismatches = []
        for strategy in STRATEGY_NAMES:
            for q in QUERIES:
                t0 = time.time()
                top = reference_rank(disk_index, n, q, strategy)
                ref_lat.append(time.time() - t0)
                ref = sorted(
                    (id_to_title[doc_id], round(score, 9)) for score, doc_id in top
                )
                if ref != spark_results[(strategy, q)]:
                    mismatches.append({"strategy": strategy, "query": q,
                                       "ref": ref[:3],
                                       "spark": spark_results[(strategy, q)][:3]})
        out["rank_identical"] = not mismatches
        out["mismatches"] = mismatches[:4]
        out["ref_query_p50_ms"] = round(statistics.median(ref_lat) * 1000, 1)
        out["spark_query_p50_ms"] = round(statistics.median(spark_lat) * 1000, 1)
        print(json.dumps(out))
    finally:
        shutil.rmtree(corpus_dir, ignore_errors=True)
        shutil.rmtree(index_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
