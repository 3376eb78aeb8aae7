"""DuckDB oracle-SQL builders for the gate entries that previously had
no SQL twin:

* ``ref_prefix()``         — the full reference analyzer in SQL:
  EnglishTokenStream split (englishtokenstream.py:15-19), the
  NewTokenProcessor clean / quote-drop / hyphen triple-emit
  (newtokenprocessor.py:10-34), Porter2 stemming via the generated CTE
  chain (``porter2_sql``), and main.py:151-213's pairwise-loop quirks
  (1-token docs emit no terms; docLength = max(#tokens, 1)).
* ``ref_bm25_sql()``       — BM25 top-k over that analyzer, query terms
  stemmed by the SAME SQL chain (no precomputed constants).
* ``ref_boolean_mixed_sql()`` — AND/OR/AND-NOT over stemmed terms.
* ``quirky_pair_sql()``    — the reference's two-pointer positional
  merges (merge_posting.py:62-113 phrase, :260-308 NEAR) replayed
  exactly with a recursive CTE: the pointer walk is simulated
  step-by-step, then the tail-leftover loops become list_filter
  predicates over the unconsumed suffixes.
* ``ivf_fixedpoint_sql()`` — the fixed-point Lloyd IVF quantizer
  (ops/similarity.fit_fixedpoint) replayed: integer squared-L2 makes
  every arithmetic step exact, so seeds → 2 Lloyd rounds → probe →
  exact cosine hash-match across engines.

All builders return self-contained SQL over the driver's pre-registered
views (``documents``, ``embeddings``).
"""

from __future__ import annotations

from .porter2_sql import porter2_cte_chain, porter2_scalar_sql

# Python str.strip() whitespace, spelled without escape-string dialects.
_WS = "' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)"


def ref_prefix() -> str:
    """WITH-clause prefix computing the reference-analyzer postings
    (``refpost``: term, doc_id, tftd), per-doc lengths (``refdl``) and
    corpus stats (``refc``) from the ``documents`` view."""
    return (
        f"""
WITH rtokarr AS (
  -- EnglishTokenStream: split lines on single spaces, strip, drop empties
  SELECT doc_id,
         list_filter(
           list_transform(string_split_regex(text, '[ \n]'),
                          s -> trim(s, {_WS})),
           s -> s <> '') AS toks
  FROM documents
),
rtok AS (
  SELECT doc_id, unnest(toks) AS rawtok,
         generate_subscripts(toks, 1) AS pos, len(toks) AS n_tok
  FROM rtokarr
),
ctok AS (
  -- NewTokenProcessor: strip non-alnum edges, lowercase, drop ' and ".
  -- Unicode classes \\p{{L}}\\p{{N}} mirror Python str.isalnum() (which
  -- accepts accented letters and numeric forms), so the twin holds on
  -- non-ASCII corpora too, not just the shipped ASCII testdata.
  SELECT doc_id, pos, n_tok,
         replace(replace(lower(
           regexp_replace(regexp_replace(rawtok,
                          '^[^\\p{{L}}\\p{{N}}]+', ''),
                          '[^\\p{{L}}\\p{{N}}]+$', '')), '''', ''), '"', '')
           AS c
  FROM rtok
),
etok AS (
  -- hyphen triple-emit: fused form + each part, sharing the position
  SELECT doc_id, pos, n_tok,
         unnest(CASE WHEN contains(c, '-')
                     THEN list_concat([replace(c, '-', '')],
                                      string_split(c, '-'))
                     ELSE [c] END) AS pre
  FROM ctok
),
"""
        + porter2_cte_chain("etok", "pre")
        + """,
rterm AS (
  -- main.py pairwise loop: docs with a single token emit NO terms
  SELECT e.doc_id, e.pos, s.stem AS term
  FROM etok e JOIN p2_out s ON e.pre = s.tok
  WHERE e.n_tok >= 2
),
refpost AS (
  SELECT term, doc_id, count(*)::BIGINT AS tftd FROM rterm
  GROUP BY term, doc_id
),
refdl AS (
  -- docLength quirk: n-1 loop increments + final +1 => max(#tokens, 1)
  SELECT doc_id, greatest(len(toks), 1)::DOUBLE AS doc_length FROM rtokarr
),
refc AS (
  SELECT count(*)::DOUBLE AS n_docs, avg(doc_length) AS avg_dl FROM refdl
)
"""
    )


def ref_bm25_sql(raw_terms: list[str], k: int = 10) -> str:
    """BM25 top-k through the reference analyzer; raw query terms are
    stemmed by the same SQL chain (rank-mode TermLiteral:
    termliteral.py:36-42 — the last expansion, i.e. the plain stem for
    unhyphenated terms). ``mult`` mirrors query_rank_terms: distinct
    raw terms that stem to one index term accumulate that term twice."""
    return (
        ref_prefix()
        + f"""
, qmap AS (SELECT * FROM {porter2_scalar_sql(sorted(set(raw_terms)))}),
qterms AS (
  SELECT stem AS term, count(*)::DOUBLE AS mult FROM qmap GROUP BY stem
),
refdft AS (
  SELECT p.term, count(*)::DOUBLE AS dft
  FROM refpost p JOIN qterms q USING (term) GROUP BY p.term
),
refwq AS (
  SELECT d.term, q.mult,
         greatest(0.1, ln((s.n_docs - d.dft + 0.5) / (d.dft + 0.5))) AS wqt
  FROM refdft d JOIN qterms q USING (term) CROSS JOIN refc s
),
refsc AS (
  SELECT p.doc_id,
         sum(w.mult * w.wqt * (2.2 * p.tftd)
             / (1.2 * (0.25 + 0.75 * l.doc_length / s.avg_dl) + p.tftd))
           AS score
  FROM refpost p JOIN refwq w USING (term) JOIN refdl l USING (doc_id)
  CROSS JOIN refc s GROUP BY p.doc_id
)
SELECT doc_id, floor(score * 1e6)::BIGINT AS score_e6
FROM refsc ORDER BY score DESC, doc_id DESC LIMIT {k}
"""
    )


def ref_boolean_mixed_sql() -> str:
    """'table scan + agg -join' through the reference analyzer:
    (table AND scan) OR (agg AND-NOT join), terms stemmed in SQL."""
    return (
        ref_prefix()
        + f"""
, qmap AS (SELECT * FROM {porter2_scalar_sql(['table', 'scan', 'agg', 'join'])})
SELECT DISTINCT doc_id FROM (
  SELECT a.doc_id FROM refpost a JOIN refpost b USING (doc_id)
  WHERE a.term = (SELECT stem FROM qmap WHERE tok = 'table')
    AND b.term = (SELECT stem FROM qmap WHERE tok = 'scan')
  UNION
  SELECT doc_id FROM refpost
  WHERE term = (SELECT stem FROM qmap WHERE tok = 'agg')
    AND doc_id NOT IN (
      SELECT doc_id FROM refpost
      WHERE term = (SELECT stem FROM qmap WHERE tok = 'join'))
)
"""
    )


def quirky_pair_sql(simple_prefix: str, t1: str, t2: str, offset: int,
                    mode: str) -> str:
    """Replay the reference's quirky two-pointer positional merge as a
    recursive CTE over the simple-analyzer ``tok`` CTE.

    ``mode='phrase'`` (merge_posting.py:62-113): the main loop matches
    pos2 − pos1 == offset; BOTH tail loops run (leftover side vs the
    other side's LAST position, == offset).
    ``mode='near'`` (merge_posting.py:260-308): main loop matches
    EXACTLY k; the first tail loop is dead code in the reference (its
    guard re-tests the main loop's exit condition), and the second
    uses <= k against posting1's last position — with NO lower bound,
    so a leftover pos2 BEFORE the last pos1 also matches.

    The pointer walk advances at least one pointer per step, so the
    recursion is bounded by |P1| + |P2| per document and only ever runs
    over docs containing both terms.
    """
    hit = f"q.p2[w.j] - q.p1[w.i] = {offset}"
    if mode == "phrase":
        tails = f"""
     OR len(list_filter(list_slice(p1, i, n1), x -> p2[n2] - x = {offset})) > 0
     OR len(list_filter(list_slice(p2, j, n2), y -> y - p1[n1] = {offset})) > 0"""
    elif mode == "near":
        tails = f"""
     OR len(list_filter(list_slice(p2, j, n2), y -> y - p1[n1] <= {offset})) > 0"""
    else:  # pragma: no cover
        raise ValueError(mode)
    prefix = simple_prefix.replace("WITH tokarr", "WITH RECURSIVE tokarr", 1)
    return (
        prefix
        + f"""
, pl AS (SELECT doc_id, list(pos ORDER BY pos) AS p FROM tok
         WHERE term = '{t1}' GROUP BY doc_id),
pr AS (SELECT doc_id, list(pos ORDER BY pos) AS p FROM tok
       WHERE term = '{t2}' GROUP BY doc_id),
pairs AS (
  SELECT pl.doc_id, pl.p AS p1, pr.p AS p2, len(pl.p) AS n1, len(pr.p) AS n2
  FROM pl JOIN pr USING (doc_id)
),
walk AS (
  SELECT doc_id, 1 AS i, 1 AS j, FALSE AS found FROM pairs
  UNION ALL
  SELECT w.doc_id,
         CASE WHEN {hit} OR q.p1[w.i] <= q.p2[w.j] THEN w.i + 1 ELSE w.i END,
         CASE WHEN {hit} OR q.p2[w.j] <= q.p1[w.i] THEN w.j + 1 ELSE w.j END,
         w.found OR {hit}
  FROM walk w JOIN pairs q USING (doc_id)
  WHERE w.i <= q.n1 AND w.j <= q.n2
),
fin AS (
  SELECT w.doc_id, w.i, w.j, w.found, q.p1, q.p2, q.n1, q.n2
  FROM walk w JOIN pairs q USING (doc_id)
  WHERE w.i > q.n1 OR w.j > q.n2
)
SELECT doc_id FROM fin
WHERE found {tails}
"""
    )


def ivf_fixedpoint_sql(n_centroids: int = 8, n_iter: int = 2,
                       n_probe: int = 4, dim: int = 64, k: int = 10,
                       scale: int = 1 << 20,
                       as_cte: bool = False) -> str:
    """Replay ops/similarity.IvfIndex.fit_fixedpoint + search: scaled
    integer vectors, evenly-spaced-by-id seeds, ``n_iter`` Lloyd rounds
    with floor-mean updates, probe the ``n_probe`` nearest cells, exact
    cosine top-k on the original float vectors. Integer arithmetic
    throughout fit/assign/probe makes the replay bit-exact."""
    zdist = ("list_sum(list_transform(list_zip({a}, {b}),"
             " z -> (z[1]-z[2])*(z[1]-z[2])))")

    def iteration(i: int) -> str:
        return f"""
a{i} AS (
  SELECT vec_id, xs, cid FROM (
    SELECT x.vec_id, x.xs, c.cid,
           row_number() OVER (PARTITION BY x.vec_id
                              ORDER BY {zdist.format(a='x.xs', b='c.cs')},
                                       c.cid) AS rr
    FROM x CROSS JOIN c{i} c
  ) WHERE rr = 1
),
m{i} AS (
  SELECT cid, d, floor(sum(xs[d])::DOUBLE / count(*))::BIGINT AS v
  FROM a{i} CROSS JOIN generate_series(1, {dim}) AS g(d)
  GROUP BY cid, d
),
c{i + 1} AS (
  SELECT c{i}.cid, coalesce(m.cs, c{i}.cs) AS cs
  FROM c{i} LEFT JOIN (SELECT cid, list(v ORDER BY d) AS cs
                       FROM m{i} GROUP BY cid) m
  USING (cid)
)"""

    iters = ",".join(iteration(i) for i in range(n_iter))
    body = f"""
WITH x AS (
  SELECT vec_id, embedding,
         list_transform(embedding,
                        v -> floor(v::DOUBLE * {float(scale)})::BIGINT) AS xs
  FROM embeddings WHERE vec_id <> 0
),
st AS (SELECT greatest(1, count(*) // {n_centroids}) AS step FROM x),
rnk AS (SELECT vec_id, xs, row_number() OVER (ORDER BY vec_id) AS rn FROM x),
c0 AS (
  SELECT ((rn - 1) // st.step)::INT AS cid, xs AS cs
  FROM rnk, st
  WHERE (rn - 1) % st.step = 0 AND rn <= 1 + {n_centroids - 1} * st.step
),{iters},
af AS (
  SELECT vec_id, cid FROM (
    SELECT x.vec_id, c.cid,
           row_number() OVER (PARTITION BY x.vec_id
                              ORDER BY {zdist.format(a='x.xs', b='c.cs')},
                                       c.cid) AS rr
    FROM x CROSS JOIN c{n_iter} c
  ) WHERE rr = 1
),
qx AS (
  SELECT list_transform(embedding,
                        v -> floor(v::DOUBLE * {float(scale)})::BIGINT) AS xs,
         embedding AS qv
  FROM embeddings WHERE vec_id = 0
),
probe AS (
  SELECT cid FROM (
    SELECT c.cid,
           row_number() OVER (ORDER BY {zdist.format(a='q.xs', b='c.cs')},
                                       c.cid) AS rr
    FROM c{n_iter} c CROSS JOIN qx q
  ) WHERE rr <= {n_probe}
),
cand AS (SELECT a.vec_id FROM af a JOIN probe p USING (cid)),
expq AS (SELECT generate_subscripts(qv, 1) AS i, unnest(qv)::DOUBLE AS qval
         FROM qx),
expe AS (
  SELECT e.vec_id, generate_subscripts(e.embedding, 1) AS i,
         unnest(e.embedding)::DOUBLE AS v
  FROM embeddings e JOIN cand USING (vec_id)
),
dots AS (
  SELECT vec_id, sum(v * qval) AS dot, sum(v * v) AS nv
  FROM expe JOIN expq USING (i) GROUP BY vec_id
),
qn AS (SELECT sqrt(sum(qval * qval)) AS qnorm FROM expq)"""
    tail_cte = f"""
, densetop AS (
  SELECT vec_id, dot / (sqrt(nv) * qnorm) AS cosine
  FROM dots, qn ORDER BY dot / (sqrt(nv) * qnorm) DESC, vec_id ASC
  LIMIT {k}
)"""
    tail_final = f"""
SELECT vec_id, floor(dot / (sqrt(nv) * qnorm) * 1e6)::BIGINT AS cosine_e6
FROM dots, qn
ORDER BY dot / (sqrt(nv) * qnorm) DESC, vec_id ASC LIMIT {k}
"""
    if as_cte:
        # strip the leading WITH so the chain splices after another
        # WITH-block; ends at a comma-ready densetop (vec_id, cosine)
        return body.replace("\nWITH x AS (", "x AS (", 1) + tail_cte
    return body + tail_final
