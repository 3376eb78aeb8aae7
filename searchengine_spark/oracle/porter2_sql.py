"""Porter2 (Snowball English) stemmer expressed as a pure-SQL CTE
chain — the DuckDB twin of ``text/porter2.py``.

Why this exists: the driver's correctness gate runs ANSI SQL through
DuckDB, whose snowball ``stem()`` lives in the fts extension that
cannot be installed offline. Without a SQL stemmer every query that
goes through the reference analyzer (NewTokenProcessor → Porter2,
/root/reference/text/newtokenprocessor.py:30-33) was a weaker
rows-only check. This module generates a self-contained SQL fragment
implementing the same public algorithm
(https://snowballstem.org/algorithms/english/stemmer.html) as a chain
of CTE stages, so stemmed-path gate entries (``ref_bm25_topk``,
``ref_boolean_mixed``) get full rows+schema+hash oracles.

It is an INDEPENDENT execution path: the SQL is generated from the
algorithm's published spec (regions R1/R2, steps 0-5, exception lists)
— not by tracing the Python implementation on the data — so a bug in
either twin shows up as a gate hash mismatch.

The generated fragment maps a column of lowercase tokens to stems:

    WITH toks AS (...),
    {porter2_cte_chain(src="toks", col="tok")}
    SELECT ... FROM p2_out ...   -- columns (tok, stem)

All stages operate on plain columns (no recursion); cost is
O(#distinct tokens), so callers should feed DISTINCT tokens and join
back.
"""

from __future__ import annotations

VOWEL = "[aeiouy]"          # marked consonant-Y is excluded on purpose
NONV = "[^aeiouy]"

_EXC1 = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}

_EXC2 = ("inning", "outing", "canning", "herring", "earring",
         "proceed", "exceed", "succeed")

_STEP2 = (
    ("ization", "ize"), ("ational", "ate"), ("fulness", "ful"),
    ("ousness", "ous"), ("iveness", "ive"), ("tional", "tion"),
    ("biliti", "ble"), ("lessli", "less"), ("entli", "ent"),
    ("ation", "ate"), ("alism", "al"), ("aliti", "al"),
    ("ousli", "ous"), ("iviti", "ive"), ("fulli", "ful"),
    ("enci", "ence"), ("anci", "ance"), ("abli", "able"),
    ("izer", "ize"), ("ator", "ate"), ("alli", "al"),
    ("bli", "ble"), ("ogi", "og"), ("li", ""),
)

_STEP3 = (
    ("ational", "ate"), ("tional", "tion"), ("alize", "al"),
    ("icate", "ic"), ("iciti", "ic"), ("ical", "ic"),
    ("ative", ""), ("ful", ""), ("ness", ""),
)

_STEP4 = (
    "ement", "ance", "ence", "able", "ible", "ment",
    "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
    "ion", "al", "er", "ic",
)

_LI_END = ("c", "d", "e", "g", "h", "k", "m", "n", "r", "t")


def _short(x: str) -> str:
    """SQL predicate: word ``x`` ends in a short syllable (Snowball
    definition: non-vowel, vowel, non-vowel-not-wxY at the end; or the
    whole word is vowel + non-vowel)."""
    return (
        f"(regexp_matches({x}, '{NONV}{VOWEL}[^aeiouywxY]$')"
        f" OR regexp_matches({x}, '^{VOWEL}{NONV}$'))"
    )


def _chop(w: str, n: int) -> str:
    return f"substr({w}, 1, length({w}) - {n})"


def porter2_cte_chain(src: str, col: str, prefix: str = "p2") -> str:
    """Return CTE definitions (to splice after an existing WITH list)
    mapping DISTINCT ``col`` values of CTE/table ``src`` to stems.

    The final CTE is ``{prefix}_out`` with columns (tok, stem).
    """
    p = prefix

    # -- stage a: distinct tokens; length<=2 short-circuits; strip one
    #    leading apostrophe; exception-list words short-circuit.
    exc1 = " ".join(
        f"WHEN '{k}' THEN '{v}'" for k, v in _EXC1.items()
    )
    a = f"""
{p}_a AS (
  SELECT tok,
         CASE WHEN length(tok) <= 2 THEN tok
              ELSE CASE w0 {exc1} END END AS ret,
         w0 AS w
  FROM (
    SELECT tok,
           CASE WHEN starts_with(tok, '''') THEN substr(tok, 2)
                ELSE tok END AS w0
    FROM (SELECT DISTINCT {col} AS tok FROM {src})
  )
)"""

    # -- stage b: mark consonant-y as Y (initial y; y after a vowel,
    #    scanning left to right — global regex replicates the scan
    #    because each replacement consumes its vowel).
    b = f"""
{p}_b AS (
  SELECT tok, ret,
         regexp_replace(
           CASE WHEN starts_with(w, 'y') THEN 'Y' || substr(w, 2) ELSE w END,
           '({VOWEL})y', '\\1Y', 'g') AS w
  FROM {p}_a
)"""

    # -- stage c: regions R1/R2 as integer start offsets (0-based,
    #    fixed for the rest of the algorithm).  R1 = after the first
    #    non-vowel that follows a vowel (special prefixes pin it);
    #    R2 = same rule applied from R1.
    vc = f"{VOWEL}{NONV}"
    c = f"""
{p}_c AS (
  SELECT tok, ret, w,
         CASE WHEN starts_with(w, 'gener') THEN 5
              WHEN starts_with(w, 'commun') THEN 6
              WHEN starts_with(w, 'arsen') THEN 5
              WHEN regexp_matches(w, '{vc}')
                THEN length(w) - length(regexp_replace(w, '^.*?{vc}', ''))
              ELSE length(w) END AS r1
  FROM {p}_b
),
{p}_c2 AS (
  SELECT tok, ret, w, r1,
         CASE WHEN regexp_matches(substr(w, r1 + 1), '{vc}')
                THEN r1 + length(substr(w, r1 + 1))
                     - length(regexp_replace(substr(w, r1 + 1), '^.*?{vc}', ''))
              ELSE length(w) END AS r2
  FROM {p}_c
)"""

    # -- stage d: step 0 — longest of 's / 's / '  (apostrophes).
    d = f"""
{p}_d AS (
  SELECT tok, ret, r1, r2,
         CASE WHEN ends_with(w, '''s''') THEN {_chop('w', 3)}
              WHEN ends_with(w, '''s') THEN {_chop('w', 2)}
              WHEN ends_with(w, '''') THEN {_chop('w', 1)}
              ELSE w END AS w
  FROM {p}_c2
)"""

    # -- stage e: step 1a + the post-1a invariant list.
    exc2 = ", ".join(f"'{x}'" for x in _EXC2)
    e = f"""
{p}_e AS (
  SELECT tok, r1, r2,
         coalesce(ret, CASE WHEN w1a IN ({exc2}) THEN w1a END) AS ret,
         w1a AS w
  FROM (
    SELECT tok, ret, r1, r2,
           CASE WHEN ends_with(w, 'sses') THEN {_chop('w', 2)}
                WHEN ends_with(w, 'ied') OR ends_with(w, 'ies')
                  THEN {_chop('w', 3)} ||
                       CASE WHEN length(w) > 4 THEN 'i' ELSE 'ie' END
                WHEN ends_with(w, 'us') OR ends_with(w, 'ss') THEN w
                WHEN ends_with(w, 's') THEN
                  CASE WHEN regexp_matches({_chop('w', 2)}, '{VOWEL}')
                       THEN {_chop('w', 1)} ELSE w END
                ELSE w END AS w1a
    FROM {p}_d
  )
)"""

    # -- stage f/g: step 1b — first matching suffix decides the branch
    #    (even when its condition then fails), exactly like the
    #    spec's longest-match-then-test.
    f_ = f"""
{p}_f AS (
  SELECT tok, ret, r1, r2, w,
         CASE WHEN ends_with(w, 'eedly') THEN 'eedly'
              WHEN ends_with(w, 'ingly') THEN 'ingly'
              WHEN ends_with(w, 'edly') THEN 'edly'
              WHEN ends_with(w, 'eed') THEN 'eed'
              WHEN ends_with(w, 'ing') THEN 'ing'
              WHEN ends_with(w, 'ed') THEN 'ed'
              END AS suf,
         CASE WHEN ends_with(w, 'eedly') THEN {_chop('w', 5)}
              WHEN ends_with(w, 'ingly') THEN {_chop('w', 5)}
              WHEN ends_with(w, 'edly') THEN {_chop('w', 4)}
              WHEN ends_with(w, 'eed') THEN {_chop('w', 3)}
              WHEN ends_with(w, 'ing') THEN {_chop('w', 3)}
              WHEN ends_with(w, 'ed') THEN {_chop('w', 2)}
              END AS sp
  FROM {p}_e
)"""
    doubles = "(bb|dd|ff|gg|mm|nn|pp|rr|tt)$"
    g = f"""
{p}_g AS (
  SELECT tok, ret, r1, r2,
         CASE
           WHEN suf IN ('eed', 'eedly') THEN
             CASE WHEN length(w) - length(suf) >= r1 THEN sp || 'ee'
                  ELSE w END
           WHEN suf IS NOT NULL THEN
             CASE WHEN NOT regexp_matches(sp, '{VOWEL}') THEN w
                  WHEN ends_with(sp, 'at') OR ends_with(sp, 'bl')
                       OR ends_with(sp, 'iz') THEN sp || 'e'
                  WHEN regexp_matches(sp, '{doubles}') THEN {_chop('sp', 1)}
                  WHEN {_short('sp')} AND r1 >= length(sp) THEN sp || 'e'
                  ELSE sp END
           ELSE w END AS w
  FROM {p}_f
)"""

    # -- stage h: step 1c — y after a consonant becomes i.
    h = f"""
{p}_h AS (
  SELECT tok, ret, r1, r2,
         CASE WHEN length(w) > 2 AND regexp_matches(w, '{NONV}[yY]$')
              THEN {_chop('w', 1)} || 'i' ELSE w END AS w
  FROM {p}_g
)"""

    # -- stage i: step 2 (suffix must start in R1; first match wins).
    def generic(suf: str, repl: str, region: str) -> str:
        n = len(suf)
        return (
            f"WHEN ends_with(w, '{suf}') THEN "
            f"CASE WHEN length(w) - {n} >= {region} "
            f"THEN {_chop('w', n)} || '{repl}' ELSE w END"
        )

    li_set = ", ".join(f"'{c}'" for c in _LI_END)
    step2_whens = []
    for suf, repl in _STEP2:
        if suf == "ogi":
            step2_whens.append(
                "WHEN ends_with(w, 'ogi') THEN "
                "CASE WHEN length(w) - 3 >= r1 AND ends_with(w, 'logi') "
                f"THEN {_chop('w', 1)} ELSE w END"
            )
        elif suf == "li":
            step2_whens.append(
                "WHEN ends_with(w, 'li') THEN "
                f"CASE WHEN length(w) - 2 >= r1 AND length(w) >= 3 "
                f"AND substr(w, length(w) - 2, 1) IN ({li_set}) "
                f"THEN {_chop('w', 2)} ELSE w END"
            )
        else:
            step2_whens.append(generic(suf, repl, "r1"))
    i_ = f"""
{p}_i AS (
  SELECT tok, ret, r1, r2,
         CASE {' '.join(step2_whens)} ELSE w END AS w
  FROM {p}_h
)"""

    # -- stage j: step 3 ('ative' additionally requires R2).
    step3_whens = []
    for suf, repl in _STEP3:
        region = "r2" if suf == "ative" else "r1"
        step3_whens.append(generic(suf, repl, region))
    j = f"""
{p}_j AS (
  SELECT tok, ret, r1, r2,
         CASE {' '.join(step3_whens)} ELSE w END AS w
  FROM {p}_i
)"""

    # -- stage k: step 4 (delete in R2; 'ion' needs preceding s/t).
    step4_whens = []
    for suf in _STEP4:
        if suf == "ion":
            step4_whens.append(
                "WHEN ends_with(w, 'ion') THEN "
                "CASE WHEN length(w) - 3 >= r2 AND length(w) >= 4 "
                "AND substr(w, length(w) - 3, 1) IN ('s', 't') "
                f"THEN {_chop('w', 3)} ELSE w END"
            )
        else:
            step4_whens.append(generic(suf, "", "r2"))
    k = f"""
{p}_k AS (
  SELECT tok, ret, r1, r2,
         CASE {' '.join(step4_whens)} ELSE w END AS w
  FROM {p}_j
)"""

    # -- stage l: step 5 (-e, -ll) + unmark Y.
    l_ = f"""
{p}_l AS (
  SELECT tok, ret,
         CASE WHEN ends_with(w, 'e') THEN
                CASE WHEN length(w) - 1 >= r2
                       OR (length(w) - 1 >= r1
                           AND NOT {_short(_chop('w', 1))})
                     THEN {_chop('w', 1)} ELSE w END
              WHEN ends_with(w, 'l') THEN
                CASE WHEN length(w) - 1 >= r2 AND length(w) >= 2
                       AND substr(w, length(w) - 1, 1) = 'l'
                     THEN {_chop('w', 1)} ELSE w END
              ELSE w END AS w
  FROM {p}_k
),
{p}_out AS (
  SELECT tok, coalesce(ret, replace(w, 'Y', 'y')) AS stem FROM {p}_l
)"""

    return ",\n".join([a, b, c, d, e, f_, g, h, i_, j, k, l_])


def porter2_scalar_sql(values: list[str]) -> str:
    """A self-contained subquery stemming a literal list of lowercase
    words — used to normalize QUERY terms inside oracle SQL (the same
    chain the corpus vocabulary goes through).  Yields rows
    (tok, stem)."""
    vals = ", ".join(f"('{v}')" for v in values)
    return (
        f"(WITH qraw(tok) AS (VALUES {vals}),\n"
        + porter2_cte_chain("qraw", "tok", prefix="q2")
        + "\nSELECT tok, stem FROM q2_out)"
    )
