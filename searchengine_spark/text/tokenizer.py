"""Tokenization — the parity linchpin shared by the Spark engine, the
pure-Python oracle, and the pytest goldens.

Reference semantics being mirrored (see SURVEY.md §2.1):

* ``english_tokens``  — EnglishTokenStream: iterate lines, split each
  line on a SINGLE SPACE, ``str.strip()`` each piece, drop empties
  (/root/reference/text/englishtokenstream.py:15-19).
* ``process_token``   — NewTokenProcessor: strip non-alphanumeric
  edges, lowercase while dropping only ``'`` and ``"`` chars (the
  regex comparison at /root/reference/text/newtokenprocessor.py:21 is
  a no-op, so all other punctuation survives), hyphen triple-emit
  (``Hewlett-Packard -> [hewlettpackard, hewlett, packard]``), then
  Porter2-stem every emitted term
  (/root/reference/text/newtokenprocessor.py:10-34).
* ``basic_process``   — BasicTokenProcessor: drop ``\\W`` chars and
  lowercase (/root/reference/text/basictokenprocessor.py:5-11).
* ``analyze_document`` — the indexing loop of
  /root/reference/main.py:151-213, including its quirks:
  positions are 1-based and PER TOKEN (hyphen expansions share one
  position); a document with a single token emits NO terms (the
  pairwise loop never runs and ``next_terms`` stays empty); docLength
  counts tokens with a final ``+1`` so an empty doc has docLength 1.
* ``soundex`` — /root/reference/soundexcode.py:4-38.

All functions are pure and dependency-free so they can run inside
Arrow-batched pandas UDFs on executors and inside the pytest oracle.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .porter2 import stem

_SOUNDEX_CODES = {
    **dict.fromkeys("bfpv", "1"),
    **dict.fromkeys("cgjkqsxz", "2"),
    **dict.fromkeys("dt", "3"),
    **dict.fromkeys("l", "4"),
    **dict.fromkeys("mn", "5"),
    **dict.fromkeys("r", "6"),
}


def english_tokens(text: str) -> list[str]:
    """Split text into raw tokens exactly like EnglishTokenStream."""
    out: list[str] = []
    for line in text.split("\n"):
        for piece in line.split(" "):
            tok = piece.strip()
            if tok:
                out.append(tok)
    return out


def _clean_token(token: str) -> str:
    """Edge-strip + lowercase + drop quotes (NewTokenProcessor a/b)."""
    t = token
    start = 0
    end = len(t)
    while start < end and not t[start].isalnum():
        start += 1
    while end > start and not t[end - 1].isalnum():
        end -= 1
    t = t[start:end]
    out = []
    for ch in t:
        if ch != "'" and ch != '"':
            out.append(ch.lower())
    return "".join(out)


def process_token(token: str, stemmer=stem) -> list[str]:
    """NewTokenProcessor.process_token: returns the list of emitted terms."""
    cleaned = _clean_token(token)
    if "-" in cleaned:
        parts = [cleaned.replace("-", "")] + cleaned.split("-")
        return [stemmer(p) for p in parts]
    return [stemmer(cleaned)]


def process_token_nostem(token: str) -> list[str]:
    """NewTokenProcessor semantics without the stemming step (used by
    SQL-oracle-checked query variants where the oracle cannot stem)."""
    return process_token(token, stemmer=lambda t: t)


def basic_process(token: str) -> str:
    """BasicTokenProcessor: remove \\W chars, lowercase."""
    return "".join(ch for ch in token if ch.isalnum() or ch == "_").lower()


def soundex(term: str) -> str:
    """4-character soundex, bug-for-bug with
    /root/reference/soundexcode.py:25-43: digits are computed over
    term[1:] only (no dedupe against the head letter's own code), the
    adjacent-dedupe loop drops a trailing run of equal digits entirely,
    and a 1-digit list yields no digits at all.
    """
    if not term:
        return ""
    digits = [int(_SOUNDEX_CODES.get(ch, "0")) for ch in term[1:]]
    code: list[int] = []
    for i in range(len(digits) - 1):
        if digits[i] != digits[i + 1]:
            code.append(digits[i])
            if i + 1 == len(digits) - 1:
                code.append(digits[i + 1])
    code = [c for c in code if c != 0]
    while len(code) < 3:
        code.append(0)
    return (term[0].upper() + "".join(str(c) for c in code))[:4]


@dataclass
class DocAnalysis:
    """Per-document indexing result mirroring main.py:151-213."""

    # (term, position) pairs in emission order; hyphen expansions share
    # a position.
    term_positions: list[tuple[str, int]] = field(default_factory=list)
    # biword keys "t1 t2" in emission order (duplicates preserved;
    # InvertedIndex dedupes consecutive same-doc adds).
    biwords: list[str] = field(default_factory=list)
    doc_length: int = 0  # token count with the final +1 quirk
    term_tftd: dict[str, int] = field(default_factory=dict)

    @property
    def ld(self) -> float:
        import math

        total = 0.0
        for tftd in self.term_tftd.values():
            w = 1.0 + math.log(tftd)
            total += w * w
        return math.sqrt(total)

    @property
    def avg_tftd(self) -> float:
        if not self.term_tftd:
            return 0.0
        return sum(self.term_tftd.values()) / len(self.term_tftd)


def analyze_document(text: str, processor=process_token) -> DocAnalysis:
    """Replicate the reference per-document indexing loop exactly.

    Mirrors /root/reference/main.py:151-213: pairwise over the token
    stream; each pair indexes the *current* token's terms at the
    current position and emits biwords by zipping current/next term
    expansions (zip truncates); after the loop the final token's terms
    are indexed. A 1-token document therefore emits nothing, and
    docLength is #tokens with a trailing +1 (empty doc -> 1).
    """
    res = DocAnalysis()
    tokens = english_tokens(text)
    position = 1
    next_terms: list[str] = []
    for i in range(len(tokens) - 1):
        current_terms = processor(tokens[i])
        next_terms = processor(tokens[i + 1])
        for term in current_terms:
            res.term_tftd[term] = res.term_tftd.get(term, 0) + 1
            res.term_positions.append((term, position))
        for t1, t2 in zip(current_terms, next_terms):
            res.biwords.append(t1 + " " + t2)
        position += 1
        res.doc_length += 1
    for term in next_terms:
        res.term_tftd[term] = res.term_tftd.get(term, 0) + 1
        res.term_positions.append((term, position))
    res.doc_length += 1
    return res


def analyze_document_stream(text: str, processor=process_token) -> DocAnalysis:
    """The reference's OTHER indexing loop — the plain per-token stream
    used by its Cranfield and nps drivers
    (main_precision_recall_all_queries.py:26-43, main_disk.py:24-35):
    every token's terms index at its position, docLength is the exact
    token count (no trailing +1 — an empty doc is 0, and a 1-token doc
    IS indexed), and no biword pass. The two loops produce identical
    indexes except for empty docs (docLength 1 vs 0) and 1-token docs
    (which main.py's pairwise loop silently drops)."""
    res = DocAnalysis()
    tokens = english_tokens(text)
    position = 1
    for tok in tokens:
        for term in processor(tok):
            res.term_tftd[term] = res.term_tftd.get(term, 0) + 1
            res.term_positions.append((term, position))
        position += 1
        res.doc_length += 1
    return res
