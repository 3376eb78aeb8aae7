"""Pure-Python oracle: a direct transcription of the reference engine's
*semantics* (not its code) used by pytest to assert that the Spark
engine is rank-identical. Single-threaded, dict-based — intentionally
naive; it exists only to define truth on small fixtures.

Semantics sources (cited per function): /root/reference/merge_posting.py,
/root/reference/queries/*.py, /root/reference/ranked_strategy.py,
/root/reference/main.py:142-217.
"""

from __future__ import annotations

import heapq
import math
from dataclasses import dataclass, field

from ..queries.parser import Node, parse_boolean_query
from ..text.tokenizer import analyze_document, process_token

# A posting is (doc_id, tftd, positions) — positions sorted ascending.
Posting = tuple[int, int, list[int]]


@dataclass
class OracleIndex:
    """In-memory positional index + biword index + doc stats."""

    postings: dict[str, list[Posting]] = field(default_factory=dict)
    biword: dict[str, list[int]] = field(default_factory=dict)
    doc_length: dict[int, float] = field(default_factory=dict)
    ld: dict[int, float] = field(default_factory=dict)
    byte_size: dict[int, float] = field(default_factory=dict)
    avg_tftd: dict[int, float] = field(default_factory=dict)
    n_docs: int = 0
    avg_doc_length: float = 0.0

    def get_postings(self, term: str) -> list[Posting]:
        return self.postings.get(term, [])


def build_index(docs: list[tuple[int, str]], byte_sizes: dict[int, float] | None = None,
                processor=process_token) -> OracleIndex:
    """Index documents given as (doc_id, text); doc_ids must be fed in
    ascending order (reference relies on that, positionalinvertedindex.py:11-21)."""
    idx = OracleIndex()
    total_tokens = 0.0
    for doc_id, text in sorted(docs):
        ana = analyze_document(text, processor=processor)
        per_doc_positions: dict[str, list[int]] = {}
        for term, pos in ana.term_positions:
            per_doc_positions.setdefault(term, []).append(pos)
        for term, positions in per_doc_positions.items():
            idx.postings.setdefault(term, []).append(
                (doc_id, len(positions), positions)
            )
        seen_biword = set()
        for bw in ana.biwords:
            # InvertedIndex.add_term dedupes consecutive same-doc adds;
            # since we add per doc here, dedupe per doc.
            if bw not in seen_biword:
                seen_biword.add(bw)
                idx.biword.setdefault(bw, []).append(doc_id)
        idx.doc_length[doc_id] = float(ana.doc_length)
        idx.ld[doc_id] = ana.ld
        idx.avg_tftd[doc_id] = ana.avg_tftd
        idx.byte_size[doc_id] = (
            byte_sizes.get(doc_id, 0.0) if byte_sizes else float(len(text.encode()))
        )
        total_tokens += ana.doc_length
        idx.n_docs += 1
    idx.avg_doc_length = total_tokens / idx.n_docs if idx.n_docs else 0.0
    return idx


# ---------------------------------------------------------------------------
# Posting-list merges (merge_posting.py semantics, incl. quirks)
# ---------------------------------------------------------------------------

def and_merge(x: list[Posting], y: list[Posting]) -> list[Posting]:
    """Sorted intersection keeping the LEFT posting (merge_posting.py:311-324)."""
    out, i, j = [], 0, 0
    while i < len(x) and j < len(y):
        dx, dy = x[i][0], y[j][0]
        if dx == dy:
            out.append(x[i])
            i += 1
            j += 1
        elif dx < dy:
            i += 1
        else:
            j += 1
    return out


def or_merge(x: list[Posting], y: list[Posting]) -> list[Posting]:
    """Sorted union; ties keep the LEFT posting (merge_posting.py:327-350)."""
    out, i, j = [], 0, 0
    while i < len(x) and j < len(y):
        dx, dy = x[i][0], y[j][0]
        if dx == dy:
            out.append(x[i])
            i += 1
            j += 1
        elif dx < dy:
            out.append(x[i])
            i += 1
        else:
            out.append(y[j])
            j += 1
    out.extend(x[i:])
    out.extend(y[j:])
    return out


def and_not_merge(x: list[Posting], y: list[Posting]) -> list[Posting]:
    """Sorted difference x − y (merge_posting.py:353-369)."""
    out, i, j = [], 0, 0
    while i < len(x) and j < len(y):
        dx, dy = x[i][0], y[j][0]
        if dx == dy:
            i += 1
            j += 1
        elif dx < dy:
            out.append(x[i])
            i += 1
        else:
            j += 1
    out.extend(x[i:])
    return out


def phrase_merge(x: list[Posting], y: list[Posting], offset: int) -> list[Posting]:
    """Positional merge for phrases (merge_posting.py:62-113): keep docs
    where some position pair satisfies pos_y − pos_x == offset; surviving
    positions are the FIRST operand's, plus the quirky tail loops that
    compare leftovers against the other side's LAST position.
    """
    out, i, j = [], 0, 0
    while i < len(x) and j < len(y):
        dx, dy = x[i][0], y[j][0]
        if dx < dy:
            i += 1
            continue
        if dy < dx:
            j += 1
            continue
        px, py = x[i][2], y[j][2]
        hits: list[int] = []
        a = b = 0
        while a < len(px) and b < len(py):
            diff = py[b] - px[a]
            if diff == offset:
                hits.append(px[a])
                a += 1
                b += 1
            elif px[a] < py[b]:
                a += 1
            elif py[b] < px[a]:
                b += 1
            else:
                a += 1
                b += 1
        # tail quirk #1: remaining x positions vs LAST y position
        while a < len(px):
            if py and py[-1] - px[a] == offset:
                hits.append(px[a])
            a += 1
        # tail quirk #2: remaining y positions vs LAST x position
        while b < len(py):
            if px and py[b] - px[-1] == offset:
                hits.append(px[-1])
            b += 1
        if hits:
            out.append((dx, len(hits), hits))
        i += 1
        j += 1
    return out


def near_merge(x: list[Posting], y: list[Posting], k: int) -> list[Posting]:
    """NEAR/k merge (merge_posting.py:260-308): main loop requires
    pos_y − pos_x == k exactly (keeping y's positions); the first tail
    loop is dead code in the reference (condition can never hold); the
    second tail loop uses <= k against x's LAST position.
    """
    out, i, j = [], 0, 0
    while i < len(x) and j < len(y):
        dx, dy = x[i][0], y[j][0]
        if dx < dy:
            i += 1
            continue
        if dy < dx:
            j += 1
            continue
        px, py = x[i][2], y[j][2]
        hits: list[int] = []
        a = b = 0
        while a < len(px) and b < len(py):
            diff = py[b] - px[a]
            if diff == k:
                hits.append(py[b])
                a += 1
                b += 1
            elif px[a] < py[b]:
                a += 1
            elif py[b] < px[a]:
                b += 1
            else:
                a += 1
                b += 1
        while b < len(py):
            if px and py[b] - px[-1] <= k:
                hits.append(py[b])
            b += 1
        if hits:
            out.append((dx, len(hits), hits))
        i += 1
        j += 1
    return out


# ---------------------------------------------------------------------------
# Boolean query AST + evaluation (queries/*.py semantics)
# ---------------------------------------------------------------------------

def _term_postings_boolean(idx: OracleIndex, raw_term: str) -> list[Posting]:
    """TermLiteral boolean mode (queries/termliteral.py:19-54): hyphenated
    query terms use the FUSED form (tokenized[0])."""
    expansions = process_token(raw_term)
    if "-" in raw_term:
        return idx.get_postings(expansions[0])
    postings: list[Posting] = []
    for term in expansions:  # single element; loop mirrors reference
        postings = idx.get_postings(term)
    return postings


def term_for_rank_mode(raw_term: str) -> str:
    """TermLiteral rank mode (queries/termliteral.py:36-42): hyphenated
    terms pop the fused form, then the loop reassignment makes the LAST
    part win; non-hyphenated terms use their single expansion."""
    expansions = process_token(raw_term)
    if "-" in raw_term and len(expansions) > 1:
        return expansions[-1]
    return expansions[0] if expansions else ""


def eval_boolean(idx: OracleIndex, node: Node) -> list[Posting]:
    if node.kind == "term":
        return _term_postings_boolean(idx, node.term)
    if node.kind == "phrase":
        terms = node.term.split(" ")
        lists = [_term_postings_boolean(idx, t) for t in terms]
        acc = lists[0] if lists else []
        for i in range(1, len(lists)):
            acc = phrase_merge(acc, lists[i], offset=i)
        return acc
    if node.kind == "near":
        left = eval_boolean(idx, node.children[0])
        right = eval_boolean(idx, node.children[1])
        return near_merge(left, right, node.k)
    if node.kind == "not":
        # NotQuery returns child postings unchanged; negativity is
        # consumed by the enclosing AND (queries/notquery.py:8-27).
        return eval_boolean(idx, node.children[0])
    if node.kind == "and":
        # queries/andquery.py:21-38 with its not-elif quirk: when the
        # FIRST component is negative, every iteration first flips
        # posting1 = and_not(posting2, posting1), then ALSO applies the
        # current component's branch.
        acc = eval_boolean(idx, node.children[0])
        first_negative = node.children[0].is_negative
        for comp in node.children[1:]:
            p2 = eval_boolean(idx, comp)
            if first_negative:
                acc = and_not_merge(p2, acc)
            if comp.is_negative:
                acc = and_not_merge(acc, p2)
            else:
                acc = and_merge(acc, p2)
        return acc
    if node.kind == "or":
        acc = eval_boolean(idx, node.children[0])
        for comp in node.children[1:]:
            acc = or_merge(acc, eval_boolean(idx, comp))
        return acc
    raise ValueError(node.kind)


def boolean_query_docs(idx: OracleIndex, query: str) -> list[int]:
    """Run a boolean query; canonical output is sorted distinct doc_ids
    (reference prints set() order — nondeterministic, main.py:420-426)."""
    node = parse_boolean_query(query)
    if node is None:
        return []
    # Biword fast path: a single two-term phrase query (main.py:413-418).
    if node.kind == "phrase" and len(node.term.split(" ")) == 2:
        t1, t2 = node.term.split(" ")
        key = process_token(t1)[0] + " " + process_token(t2)[0]
        return sorted(set(idx.biword.get(key, [])))
    return sorted({p[0] for p in eval_boolean(idx, node)})


def phrase_query_docs(idx: OracleIndex, phrase: str) -> list[int]:
    """Positional-merge path for a phrase (bypasses the biword rewrite)."""
    return sorted({p[0] for p in eval_boolean(idx, Node("phrase", term=phrase))})


# ---------------------------------------------------------------------------
# Ranked retrieval (ranked_strategy.py semantics)
# ---------------------------------------------------------------------------

def rank(idx: OracleIndex, query: str, strategy: str = "bm25", k: int = 10,
         wqt_threshold: float | None = None) -> list[tuple[float, int]]:
    """Term-at-a-time accumulation per ranked_strategy.py:10-78.

    Query terms are deduped via set(query.split(' ')) BEFORE
    normalization (ranked_strategy.py:62). Returns [(score, doc_id)]
    sorted by heapq.nlargest tuple order: score desc, doc_id desc on
    ties (main.py:463-467). ``wqt_threshold`` enables the
    vocab-elimination pruning (S7).
    """
    n = idx.n_docs
    acc: dict[int, float] = {}
    for raw_term in set(query.split(" ")):
        term = term_for_rank_mode(raw_term)
        postings = idx.get_postings(term)
        dft = len(postings)
        if dft == 0:
            continue
        if strategy == "default":
            wqt = math.log(1.0 + n / dft)
        elif strategy == "tfidf":
            wqt = math.log(n / dft)
        elif strategy == "bm25":
            wqt = max(0.1, math.log((n - dft + 0.5) / (dft + 0.5)))
        elif strategy == "wacky":
            # reference uses numpy ln: ln(0) = -inf (no exception), so
            # max(0, ln(0)) = 0 when N == dft (ranked_strategy.py:162)
            ratio = (n - dft) / dft
            wqt = max(0.0, math.log(ratio)) if ratio > 0 else 0.0
        else:
            raise ValueError(strategy)
        if wqt_threshold is not None and wqt < wqt_threshold:
            continue
        for doc_id, tftd, _ in postings:
            if strategy == "default":
                wdt = 1.0 + math.log(tftd)
            elif strategy == "tfidf":
                wdt = float(tftd)
            elif strategy == "bm25":
                dl = idx.doc_length[doc_id]
                wdt = (2.2 * tftd) / (
                    1.2 * (0.25 + 0.75 * dl / idx.avg_doc_length) + tftd
                )
            else:  # wacky
                avg_tftd = idx.avg_tftd[doc_id]
                wdt = (1.0 + math.log(tftd)) / (1.0 + math.log(avg_tftd)) if avg_tftd > 0 else 0.0
            acc[doc_id] = acc.get(doc_id, 0.0) + wdt * wqt
    scored: list[tuple[float, int]] = []
    for doc_id, score in acc.items():
        if strategy == "bm25":
            norm = 1.0
        elif strategy == "wacky":
            norm = math.sqrt(idx.byte_size[doc_id])
        else:
            norm = idx.ld[doc_id]
        scored.append((score / norm if norm else 0.0, doc_id))
    return heapq.nlargest(k, scored)
