"""Deduplication operators for large-scale training-data pipelines:
exact (hash groupBy), MinHash + LSH banding, SimHash, and n-gram
Jaccard verification — all pure JVM DataFrame ops (no Python UDFs).

Scale notes
-----------
* Exact dedup is one shuffle on md5(text) — unskewed unless the corpus
  contains a single massively-duplicated document; AQE skew-join
  handles that tail.
* MinHash: shingling + hashing stays in whole-stage codegen
  (``transform``/``md5``/``conv``); the signature is a single
  groupBy(doc_id) with 2·H partial-aggregated mins. LSH banding turns
  all-pairs O(n²) into a self-join on (band, band_hash) buckets —
  the standard shingle→minhash→band→bucket-join pipeline.
* Candidate pairs are verified with exact shingle-set Jaccard (a
  doc_id↔doc_id shingle join), so false LSH positives are filtered
  before any destructive keep/drop decision.
* Hashes are 60-bit ints derived from md5 hex (DuckDB computes the
  identical value: ``('0x' || substr(md5(x),1,15))::bigint``), which is
  what lets the driver's SQL oracle replay every step bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..indexing.simple import token_array


def h60(col) -> F.Column:
    """60-bit deterministic hash of a string column via md5 hex —
    engine-portable (same value in DuckDB/ANSI SQL)."""
    return F.conv(F.substring(F.md5(col.cast("binary")), 1, 15), 16, 10).cast("long")


def exact_duplicates(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup groups: (text_md5, n_docs, keep_doc_id) for groups
    with >1 member; keep_doc_id = smallest doc_id (stable policy)."""
    return (
        docs.select("doc_id", F.md5(F.col(text_col).cast("binary")).alias("text_md5"))
        .groupBy("text_md5")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("doc_id").cast("long").alias("keep_doc_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


def shingles(docs: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """(doc_id, shingle): distinct word n-grams over simple-analyzer
    tokens, built via array transform — no explode of raw tokens.
    Docs shorter than n tokens emit no shingles (ngram_col's size guard
    — a bare greatest(size-n+1, 0) stop is NOT safe because Spark's
    sequence(1, 0) runs DESCENDING and indexes out of range)."""
    # function-level import: textstats imports h60 from this module
    from .textstats import ngram_col

    return (
        docs.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            token_array(F.col(text_col)).alias("ts"),
        )
        .select("doc_id", F.explode(ngram_col("ts", n)).alias("shingle"))
        .distinct()
    )


def minhash_signatures(docs: DataFrame, text_col: str = "text",
                       num_hashes: int = 8, n: int = 3) -> DataFrame:
    """(doc_id, mh0..mh{H-1}): per-permutation minima of seeded shingle
    hashes. One shuffle: groupBy(doc_id) with H partial-aggregated
    mins."""
    sh = shingles(docs, text_col, n)
    hashed = sh.select(
        "doc_id",
        *[
            h60(F.concat(F.lit(f"{i}:"), F.col("shingle"))).alias(f"h{i}")
            for i in range(num_hashes)
        ],
    )
    return hashed.groupBy("doc_id").agg(
        *[F.min(f"h{i}").alias(f"mh{i}") for i in range(num_hashes)]
    )


def band_keys(signatures: DataFrame, num_hashes: int = 8,
              bands: int = 4) -> DataFrame:
    """(doc_id, band, val): standard b×r LSH banding — the H minhashes
    split into ``bands`` bands of r = H/bands rows each; a band's key
    is the 60-bit hash of its r-tuple. Docs are candidates iff some
    band key collides, so a single boilerplate shingle (one shared
    minhash) can no longer merge millions of docs into one bucket —
    ALL r rows of a band must agree."""
    r = num_hashes // bands
    assert bands * r == num_hashes, "bands must divide num_hashes"
    return signatures.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    h60(
                        F.concat_ws(
                            ":",
                            *[F.col(f"mh{i * r + j}").cast("string")
                              for j in range(r)],
                        )
                    ).alias("val"),
                )
                for i in range(bands)
            ])
        ).alias("b"),
    ).select("doc_id", F.col("b.band").alias("band"), F.col("b.val").alias("val"))


def lsh_candidate_pairs(signatures: DataFrame, num_hashes: int = 8,
                        min_matches: int = 2, bands: int = 4,
                        bucket_cap: int = 10_000) -> DataFrame:
    """b×r-banded LSH candidate generation with a hot-bucket cap.

    * Banding: candidates must share a FULL band (r = H/bands minhashes)
      — see :func:`band_keys`. The r-tuple key is what keeps web-scale
      boilerplate from creating O(bucket²) pair explosions.
    * ``bucket_cap``: buckets with more than this many docs are dropped
      before the self-join (a bucket of B docs yields B·(B−1)/2 pairs;
      a cap bounds the worst case — at 100 TB a capped bucket is
      near-certainly template boilerplate, handled by exact dedup
      instead). The cap is part of the operator contract and is
      mirrored in the SQL oracle.
    * Survivors are post-filtered to ≥ min_matches agreeing minhashes.

    Returns (doc_a, doc_b, n_matches, est_jaccard) with doc_a < doc_b;
    est_jaccard = n_matches / H is the standard MinHash estimate.
    """
    bk = band_keys(signatures, num_hashes, bands)
    bucket_ok = (
        bk.groupBy("band", "val")
        .agg(F.count("*").alias("n_in_bucket"))
        .filter(F.col("n_in_bucket") <= bucket_cap)
        .select("band", "val")
    )
    bk = bk.join(bucket_ok, ["band", "val"])

    pairs = (
        bk.alias("x")
        .join(bk.alias("y"),
              (F.col("x.band") == F.col("y.band"))
              & (F.col("x.val") == F.col("y.val"))
              & (F.col("x.doc_id") < F.col("y.doc_id")))
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )
    sig_a = signatures.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"mh{i}").alias(f"a{i}") for i in range(num_hashes)],
    )
    sig_b = signatures.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"mh{i}").alias(f"b{i}") for i in range(num_hashes)],
    )
    matches = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(num_hashes)
    )
    return (
        # signatures are corpus-sized: pin to sort-merge (see
        # jaccard_verify's note on AQE broadcast misestimates)
        pairs.hint("merge").join(sig_a.hint("merge"), "doc_a")
        .join(sig_b.hint("merge"), "doc_b")
        .withColumn("n_matches", matches.cast("long"))
        .filter(F.col("n_matches") >= min_matches)
        .select(
            "doc_a", "doc_b", "n_matches",
            (F.col("n_matches") / F.lit(float(num_hashes))).alias("est_jaccard"),
        )
    )


def jaccard_verify(docs: DataFrame, candidates: DataFrame,
                   text_col: str = "text", n: int = 3,
                   threshold: float = 0.5) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs:
    |A∩B| / (|A|+|B|−|A∩B|) over distinct shingle sets. Returns
    (doc_a, doc_b, jaccard) for pairs ≥ threshold.

    Every join here is explicitly pinned to sort-merge: candidates
    (10^7+ rows even under banding), shingles, and the per-doc size
    table are ALL corpus-scaled, so a broadcast is never safe — without
    the hint, AQE's row estimate for the freshly-generated candidate
    table can come in under the broadcast threshold and OOM the driver
    building the broadcast (observed at 800k docs / 11M candidates),
    and at the 10^12-doc design point even the (doc_id, n_sh) table is
    terabytes."""
    sh = shingles(docs, text_col, n)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    inter = (
        candidates.select("doc_a", "doc_b").hint("merge")
        .join(sh.select(F.col("doc_id").alias("doc_a"), "shingle").hint("merge"),
              "doc_a")
        .join(sh.select(F.col("doc_id").alias("doc_b"), "shingle").hint("merge"),
              ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    return (
        inter.join(sizes.select(F.col("doc_id").alias("doc_a"),
                                F.col("n_sh").alias("na")).hint("merge"),
                   "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"),
                           F.col("n_sh").alias("nb")).hint("merge"),
              "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_common")
            / (F.col("na") + F.col("nb") - F.col("n_common")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def dedup_filter(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """Apply a dedup decision: given verified near-dup ``pairs(doc_a,
    doc_b)`` with doc_a < doc_b, keep the smallest doc_id of each
    cluster — i.e. drop every doc that appears as the LARGER member of
    any pair. (Greedy policy: for chains a<b<c this keeps a and drops
    b,c — the standard keep-first heuristic; full connected-components
    clustering would be an iterative join, unnecessary for the
    keep-smallest contract.) The anti-join strategy is left to AQE: the
    drop list is usually small (broadcast) but is corpus-scaled in the
    worst case (a heavily-duplicated crawl can drop most of the corpus)
    — a forced broadcast would recreate the driver-OOM mode documented
    in jaccard_verify."""
    drop = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    return docs.join(drop, "doc_id", "left_anti")


def duplicate_clusters(
    pairs: DataFrame, max_iter: int = 20, state_dir: str | None = None
) -> DataFrame:
    """Connected components over verified duplicate ``pairs(doc_a,
    doc_b)``: (doc_id, cluster_id) for every doc touched by a pair,
    cluster_id = smallest doc_id in the component. This is the
    transitive-closure step between pair generation and a
    keep-one-per-cluster action: :func:`dedup_filter`'s greedy
    drop-every-doc_b policy over-keeps when a non-min member never
    appears as the larger side of a pair (edges (1,5),(3,5) keep both
    1 and 3; the component {1,3,5} has one representative, 1).

    Algorithm: iterative min-label propagation with pointer jumping
    (the hash-to-min scheme of Rastogi et al. 2012, "Finding Connected
    Components in Map-Reduce in Logarithmic Rounds"): each round takes
    the min over neighbours' labels, then compresses label chains by
    one hop (label ← label(label)), converging in O(log diameter)
    rounds — duplicate clusters are near-cliques, so 2-3 rounds in
    practice. Per round: one edges⋈labels shuffle + groupBy(dst) min,
    one labels self-join for the jump, then a materialization that
    truncates the iterative lineage. Convergence is detected from
    sum(label) — per-node labels are monotonically non-increasing, so
    the decimal(38,0) sum is a fixed point iff the labels are — one
    cheap aggregate instead of a change-count join. The driver loop is
    over O(log d) rounds, never over data.

    ``state_dir`` picks the per-round state store:

    * ``None`` (default): ``localCheckpoint`` — zero-copy, but every
      round's node-sized label table lives as executor block-manager
      heap blocks. Fine at gate scale; at 10⁸ nodes the accumulated
      rounds contend on the shared heap (GC + memory bandwidth — the
      measured cause of the 0.507 N→4N efficiency at 100M pairs,
      PERF.md "CC at 100M pairs"), and local blocks are lost on
      executor loss under dynamic allocation.
    * a directory path: each round's labels are written to
      ``state_dir/labels_{r%2}`` as parquet and read back — columnar,
      compressed, OFF-heap (OS page cache), double-buffered so the
      round being read is never the one overwritten, and restartable
      from the last completed round. This is the 100-TB configuration:
      executor heap holds only the in-flight shuffle, never
      accumulated iteration state, and the store survives executor
      loss. Labels are identical either way — the option changes only
      where intermediate state lives."""
    spark = pairs.sparkSession

    def _mat(df: DataFrame, name: str) -> DataFrame:
        if state_dir is None:
            return df.localCheckpoint()
        path = f"{state_dir}/{name}"
        df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    e = pairs.select(
        F.col("doc_a").cast("long").alias("src"),
        F.col("doc_b").cast("long").alias("dst"),
    )
    edges = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).distinct()
    edges = _mat(edges, "edges")
    labels = _mat(
        edges.select(F.col("src").alias("doc_id")).distinct()
        .withColumn("label", F.col("doc_id")),
        "labels_init",
    )

    def _sum(df: DataFrame):
        return df.agg(F.sum(F.col("label").cast("decimal(38,0)"))).collect()[0][0]

    prev = _sum(labels)
    for rnd in range(max_iter):
        nbr = (
            edges.join(labels.withColumnRenamed("doc_id", "src"), "src")
            .groupBy("dst").agg(F.min("label").alias("nbr"))
            .withColumnRenamed("dst", "doc_id")
        )
        new = labels.join(nbr, "doc_id").select(
            "doc_id", F.least("label", "nbr").alias("label")
        )
        hop = new.select(F.col("doc_id").alias("label"), F.col("label").alias("ll"))
        new = _mat(
            new.join(hop, "label", "left")
            .select("doc_id", F.least("label", F.coalesce("ll", "label")).alias("label")),
            f"labels_{rnd % 2}",
        )
        cur = _sum(new)
        labels = new
        if cur == prev:
            return labels.select("doc_id", F.col("label").alias("cluster_id"))
        prev = cur
    raise RuntimeError(
        f"duplicate_clusters did not converge in {max_iter} rounds "
        "(component diameter > 2^max_iter is not a plausible dup cluster)"
    )


def dedup_cluster_filter(
    docs: DataFrame, pairs: DataFrame, state_dir: str | None = None
) -> DataFrame:
    """Keep-one-per-CLUSTER dedup action: resolve ``pairs`` to
    connected components and keep only each component's smallest
    doc_id (plus every doc in no pair). Strictly stronger than
    :func:`dedup_filter`'s greedy pair policy — see
    :func:`duplicate_clusters` (``state_dir`` is passed through to its
    per-round state store). Anti-join strategy left to AQE, same
    contract as dedup_filter."""
    drop = (
        duplicate_clusters(pairs, state_dir=state_dir)
        .filter(F.col("doc_id") != F.col("cluster_id"))
        .select("doc_id")
    )
    return docs.join(drop, "doc_id", "left_anti")


def simhash_candidate_pairs(fingerprints: DataFrame, bands: int = 4,
                            bits: int = 32,
                            max_hamming: int = 6) -> DataFrame:
    """(doc_a, doc_b, hamming): near-dup candidates from simhash
    fingerprints — the standard banded scheme: split the ``bits``-bit
    fingerprint into ``bands`` equal chunks; any pair within Hamming
    distance ``bands − 1`` shares at least one chunk verbatim
    (pigeonhole), so a per-chunk bucket join finds them without an
    all-pairs comparison. Survivors are filtered to exact
    ``bit_count(a XOR b) ≤ max_hamming`` — all codegen."""
    width = bits // bands
    assert bands * width == bits
    mask = (1 << width) - 1
    bk = fingerprints.select(
        "doc_id", "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.expr(f"shiftright(simhash, {i * width}) & {mask}")
                    .alias("val"),
                )
                for i in range(bands)
            ])
        ).alias("b"),
    ).select("doc_id", "simhash", F.col("b.band").alias("band"),
             F.col("b.val").alias("val"))
    pairs = (
        bk.alias("x")
        .join(bk.alias("y"),
              (F.col("x.band") == F.col("y.band"))
              & (F.col("x.val") == F.col("y.val"))
              & (F.col("x.doc_id") < F.col("y.doc_id")))
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.col("x.simhash").alias("sa"),
            F.col("y.simhash").alias("sb"),
        )
        .distinct()
    )
    return (
        pairs.withColumn("hamming", F.bit_count(F.expr("sa ^ sb")).cast("long"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def simhash(docs: DataFrame, text_col: str = "text", bits: int = 32) -> DataFrame:
    """(doc_id, simhash): tftd-weighted sign aggregation of word-hash
    bits. Bit b of the result is 1 iff
    Σ_words tftd·(2·bit_b(h(word))−1) > 0.

    One groupBy(doc_id) with ``bits`` partial-aggregated conditional
    sums (the mh0..mh7 MinHash pattern) — NO per-bit row explode, so
    the shuffle moves |postings| rows, not 32·|postings| (the round-1
    version exploded every (doc, term) into 32 bit rows)."""
    tok = (
        docs.select(F.col("doc_id").cast("long").alias("doc_id"),
                    F.explode(token_array(F.col(text_col))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tftd"))
        .withColumn("h", h60(F.col("term")))
    )
    bitsums = tok.groupBy("doc_id").agg(
        *[
            F.sum(
                F.col("tftd") * F.expr(f"(shiftright(h, {b}) & 1) * 2 - 1")
            ).alias(f"s{b}")
            for b in range(bits)
        ]
    )
    fp = sum(
        (
            F.when(F.col(f"s{b}") > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0))
            for b in range(bits)
        ),
        start=F.lit(0).cast("long"),
    )
    return bitsums.select("doc_id", fp.cast("long").alias("simhash"))


def substring_pairs(docs: DataFrame, n: int = 13,
                    text_col: str = "text",
                    bucket_cap: int = 10_000) -> DataFrame:
    """Exact-substring dedup candidates (Lee et al. 2021,
    arXiv:2107.06499 §4.1, window-hash formulation): document pairs
    sharing at least one token n-gram WINDOW, with the count of shared
    distinct windows. Unlike MinHash (probabilistic, whole-doc
    similarity), this catches partial overlap — a paragraph copied
    into an otherwise-unrelated page — with zero false positives at
    the window level.

    Scale shape: per-doc distinct window hashes are built row-locally
    (array_distinct before the explode — same map-only front end as
    decontam.doc_ngram_hashes); the only corpus-sized exchange is the
    groupBy(gram_hash), whose output is pre-filtered to hashes seen in
    2..bucket_cap docs before the self-join, so pair volume is bounded
    exactly like lsh_candidate_pairs' banded buckets (a window shared
    by >cap docs is boilerplate — a nav bar, a license header — and is
    excluded from pairing rather than allowed to go quadratic).

    Plan note: the declarative self-join re-derives the gram table once
    per join leg (audited: 4 tokenize+explode scans, all SMJ). Fine at
    bench scale; for a production run persist/checkpoint ``docs`` —
    or materialize doc_ngram_hashes to parquet first — so the corpus
    is tokenized once.

    Returns (doc_a, doc_b, n_shared_windows) with doc_a < doc_b.
    """
    # function-level import: decontam imports from this module at load
    from .decontam import doc_ngram_hashes

    grams = doc_ngram_hashes(docs, n, text_col)
    ok = (
        grams.groupBy("gram_hash")
        .agg(F.count("*").alias("n_docs"))
        .filter((F.col("n_docs") >= 2) & (F.col("n_docs") <= bucket_cap))
        .select("gram_hash")
    )
    # both sides are corpus-sized → pin sort-merge (AQE broadcast
    # misestimate hazard, same note as lsh_candidate_pairs)
    g2 = grams.hint("merge").join(ok.hint("merge"), "gram_hash")
    # the self-join sides are freshly-generated and corpus-sized too —
    # same AQE misestimate hazard as jaccard_verify, so pin sort-merge
    return (
        g2.hint("merge").alias("x")
        .join(
            g2.hint("merge").alias("y"),
            (F.col("x.gram_hash") == F.col("y.gram_hash"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .groupBy(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
        )
        .agg(F.count("*").cast("long").alias("n_shared_windows"))
    )


def remove_duplicate_spans(docs: DataFrame, n: int = 13,
                           text_col: str = "text",
                           keep_first: bool = True) -> DataFrame:
    """Substring-granularity dedup ACTION (Lee et al. 2021,
    arXiv:2107.06499 §4.2): rewrite each document with every token
    n-gram window that also occurs in another document REMOVED, instead
    of dropping whole documents. This is the operator that actually
    deletes the copied paragraph / licence header / nav bar while
    keeping the unique prose around it.

    Granularity is the analyzer's token stream: the rewritten
    ``text_col`` is the surviving tokens joined by single spaces (the
    token array does not retain raw byte offsets, so byte-exact span
    surgery is out of scope — downstream consumers of this pipeline
    tokenize anyway). ``keep_first=True`` keeps each duplicated window
    in its smallest-doc_id owner (the keep-smallest policy shared by
    every dedup action here) and removes it everywhere else;
    ``keep_first=False`` removes all copies everywhere.

    Scale shape: window hashes with positions are built row-locally
    and exploded; the exchanges are one groupBy(gram_hash) for the
    duplicate-window directory (count distinct docs + keeper), one
    pinned sort-merge join of windows against that directory (both
    corpus-sized), one groupBy(doc_id) collecting removal starts, and
    one doc_id join back. The rewrite itself — expanding starts to
    covered positions and filtering the token array — is row-local.

    Returns the input columns with ``text_col`` rewritten plus
    ``n_tokens_removed``.
    """
    from .textstats import ngram_col

    d = F.col("doc_id").cast("long")
    toks = docs.select(d.alias("doc_id"), token_array(F.col(text_col)).alias("ts"))
    grams_pos = (
        toks.select("doc_id", F.posexplode(ngram_col("ts", n)).alias("s0", "g"))
        .select("doc_id", (F.col("s0") + 1).cast("int").alias("start"),
                h60(F.col("g")).alias("gram_hash"))
    )
    dup_dir = (
        grams_pos.groupBy("gram_hash")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("keeper"),
        )
        .filter(F.col("n_docs") >= 2)
        .select("gram_hash", "keeper")
    )
    hits = grams_pos.hint("merge").join(dup_dir.hint("merge"), "gram_hash")
    if keep_first:
        hits = hits.filter(F.col("doc_id") != F.col("keeper"))
    starts = hits.groupBy("doc_id").agg(
        F.collect_set("start").alias("_starts")
    )

    base = docs.withColumn("doc_id", d).join(starts, "doc_id", "left")
    st = F.coalesce(F.col("_starts"), F.array().cast("array<int>"))
    covered = F.array_distinct(
        F.flatten(F.transform(st, lambda s: F.sequence(s, s + F.lit(n - 1))))
    )
    ts = token_array(F.col(text_col))
    # filter's (element, index) form keeps this row-local with no
    # element_at / sequence-over-size bookkeeping (index is 0-based;
    # covered starts are 1-based)
    kept = F.filter(ts, lambda t, i: ~F.array_contains(covered, i + F.lit(1)))
    out_cols = [c for c in docs.columns if c != text_col and c != "doc_id"]
    return base.select(
        "doc_id",
        F.array_join(kept, " ").alias(text_col),
        *out_cols,
        (F.size(ts) - F.size(kept)).cast("long").alias("n_tokens_removed"),
    )
