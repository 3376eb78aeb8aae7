"""Classification extras (SURVEY.md §2.6, C1-C4) rebuilt as DataFrame
jobs — class label = a column on the documents table (``lang`` in the
gate), features = simple-analyzer terms.

C1 Mutual-information feature selection
  (/root/reference/feature_selection.py:9-53): per (term, class) 2×2
  df-contingency, I = Σ (n/N)·log2(N·n/(row·col)), zero-cells
  contribute 0 (reference maps NaN→0); top-K terms per class.
C2 Naive Bayes (/root/reference/nb_classifier_main.py:113-205):
  priors Nc/N, add-one smoothed df-based conditionals
  (df_tc+1)/(Σ_T* df_tc + |T*|) over the top-K MI feature set,
  score = log10 P(c) + Σ_{t∈d∩T*} log10 p(t|c) (distinct terms),
  argmax with deterministic class-name tie order.
C3 Rocchio (/root/reference/rocchio_main.py:109-207): class centroid of
  L2-normalized (1+ln tftd)/Ld vectors; nearest centroid by Euclidean
  distance — computed sparsely: ‖d−c‖² = ‖d‖² + ‖c‖² − 2·d·c.
C4 kNN (/root/reference/kNN_main.py:78-297): k=5 nearest neighbors by
  the same sparse Euclidean distance, majority vote; ties broken by
  (vote count desc, Σ distance asc, class asc) — a deterministic
  simplification of the reference's add-one-neighbor tie dance.

Scale: every step is a term-keyed join + aggregation (partial-agg
friendly); centroids and feature sets are tiny broadcasts. The doc↔doc
kNN join is bounded by the shared-term inverted index — the classic
sparse trick that avoids a dense cross-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..indexing.simple import token_array


def doc_terms(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, term, tftd) over the simple analyzer."""
    return (
        docs.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.explode(token_array(F.col(text_col))).alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("int").alias("tftd"))
    )


def mi_scores(docs: DataFrame, class_col: str = "lang",
              text_col: str = "text") -> DataFrame:
    """(class, term, mi): mutual information of term presence vs class
    membership from df counts."""
    labeled = docs.select(F.col("doc_id").cast("long").alias("doc_id"),
                          F.col(class_col).alias("cls"))
    n_total = labeled.count()
    td = doc_terms(docs, text_col).join(labeled, "doc_id")

    n11 = td.groupBy("term", "cls").agg(F.count("*").cast("double").alias("n11"))
    term_df = n11.groupBy("term").agg(F.sum("n11").alias("term_df"))
    cls_n = labeled.groupBy("cls").agg(F.count("*").cast("double").alias("nc"))

    base = (
        n11.join(term_df, "term")
        .join(F.broadcast(cls_n), "cls")
        .withColumn("N", F.lit(float(n_total)))
        .withColumn("n10", F.col("term_df") - F.col("n11"))
        .withColumn("n01", F.col("nc") - F.col("n11"))
        .withColumn("n00", F.col("N") - F.col("nc") - F.col("n10"))
    )

    def cell(n, row, col):
        # (n/N) * log2(N*n / (row*col)); 0 when any factor is 0
        return F.when(
            (n > 0) & (row > 0) & (col > 0),
            (n / F.col("N"))
            * F.log2(F.col("N") * n / (row * col)),
        ).otherwise(0.0)

    pos_row = F.col("n11") + F.col("n10")          # docs containing term
    neg_row = F.col("n01") + F.col("n00")
    in_col = F.col("n11") + F.col("n01")           # docs in class (= nc)
    out_col = F.col("n10") + F.col("n00")

    mi = (
        cell(F.col("n11"), pos_row, in_col)
        + cell(F.col("n10"), pos_row, out_col)
        + cell(F.col("n01"), neg_row, in_col)
        + cell(F.col("n00"), neg_row, out_col)
    )
    return base.select(F.col("cls").alias("class"), "term", mi.alias("mi"))


def top_mi_terms(docs: DataFrame, k: int = 50, class_col: str = "lang",
                 text_col: str = "text") -> DataFrame:
    """(class, term, mi, rank): top-K MI terms per class; deterministic
    (mi desc, term asc) rank."""
    w = Window.partitionBy("class").orderBy(F.desc("mi"), F.asc("term"))
    return (
        mi_scores(docs, class_col, text_col)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def nb_classify(train: DataFrame, test: DataFrame | None = None,
                k_features: int = 50,
                class_col: str = "lang", text_col: str = "text") -> DataFrame:
    """(doc_id, pred_class): df-based add-one-smoothed NB over the
    union of per-class top-K MI terms.

    Model (features, priors, conditionals) fits on ``train`` only;
    predictions run over ``test`` (default: ``train`` — resubstitution).
    The split mirrors the reference's disputed-papers workflow: train on
    labeled federalist papers, classify the unlabeled disputed set
    (nb_classifier_main.py:113-205)."""
    if test is None:
        test = train
    labeled = train.select(F.col("doc_id").cast("long").alias("doc_id"),
                           F.col(class_col).alias("cls"))
    n_total = labeled.count()
    feats = (
        top_mi_terms(train, k_features, class_col, text_col)
        .select("term").distinct()
    )
    train_td = doc_terms(train, text_col).join(F.broadcast(feats), "term")
    td = train_td if test is train else (
        doc_terms(test, text_col).join(F.broadcast(feats), "term")
    )

    df_tc = (
        train_td.join(labeled, "doc_id")
        .groupBy("cls", "term")
        .agg(F.count("*").cast("double").alias("df_tc"))
    )
    cls_tot = df_tc.groupBy("cls").agg(F.sum("df_tc").alias("sum_df"))
    n_feats = feats.count()
    classes = labeled.groupBy("cls").agg(F.count("*").cast("double").alias("nc"))

    # conditional log-probs for every (class, feature) incl. unseen pairs
    cond = (
        classes.crossJoin(feats)
        .join(df_tc, ["cls", "term"], "left")
        .fillna({"df_tc": 0.0})
        .join(cls_tot, "cls", "left")
        .fillna({"sum_df": 0.0})
        .withColumn(
            "logp",
            F.log10((F.col("df_tc") + 1.0) / (F.col("sum_df") + F.lit(float(n_feats)))),
        )
        .select("cls", "term", "logp")
    )
    priors = classes.select(
        "cls", F.log10(F.col("nc") / F.lit(float(n_total))).alias("log_prior")
    )

    scores = (
        td.select("doc_id", "term")
        .join(F.broadcast(cond), "term")
        .groupBy("doc_id", "cls")
        .agg(F.sum("logp").alias("ll"))
        .join(F.broadcast(priors), "cls")
        .withColumn("score", F.col("ll") + F.col("log_prior"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("cls"))
    return (
        scores.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("cls").alias("pred_class"),
                F.col("score").alias("score"))
    )


def _normalized_vectors(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, term, v): wdt/Ld with wdt = 1+ln(tftd) — the Rocchio/kNN
    document representation (rocchio_main.py:109-143)."""
    td = doc_terms(docs, text_col)
    wdt = td.withColumn("wdt", F.lit(1.0) + F.log("tftd"))
    ld = wdt.groupBy("doc_id").agg(F.sqrt(F.sum(F.pow("wdt", F.lit(2.0)))).alias("ld"))
    return (
        wdt.join(ld, "doc_id")
        .select("doc_id", "term", (F.col("wdt") / F.col("ld")).alias("v"))
    )


def rocchio_classify(train: DataFrame, test: DataFrame,
                     class_col: str = "lang", text_col: str = "text") -> DataFrame:
    """(doc_id, pred_class): nearest class centroid by Euclidean
    distance over normalized vectors, sparse decomposition."""
    labeled = train.select(F.col("doc_id").cast("long").alias("doc_id"),
                           F.col(class_col).alias("cls"))
    tv = _normalized_vectors(train, text_col).join(labeled, "doc_id")
    nc = labeled.groupBy("cls").agg(F.count("*").alias("n"))
    centroid = (
        tv.groupBy("cls", "term").agg(F.sum("v").alias("sv"))
        .join(F.broadcast(nc), "cls")
        .select("cls", "term", (F.col("sv") / F.col("n")).alias("c"))
    )
    cnorm = centroid.groupBy("cls").agg(F.sum(F.pow("c", F.lit(2.0))).alias("cn2"))

    qv = _normalized_vectors(test, text_col)
    # ‖q‖² = 1 by construction; dist² = 1 + cn2 − 2·dot
    dots = (
        qv.join(centroid, "term")
        .groupBy("doc_id", "cls")
        .agg(F.sum(F.col("v") * F.col("c")).alias("dot"))
    )
    dist = (
        dots.join(F.broadcast(cnorm), "cls")
        .withColumn("dist2", F.lit(1.0) + F.col("cn2") - 2.0 * F.col("dot"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.asc("dist2"), F.asc("cls"))
    return (
        dist.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("cls").alias("pred_class"))
    )


def knn_classify(train: DataFrame, test: DataFrame, k: int = 5,
                 class_col: str = "lang", text_col: str = "text",
                 max_df: int | float | None = None,
                 quantize: bool = False) -> DataFrame:
    """(doc_id, pred_class): k-NN by sparse Euclidean distance over
    normalized vectors; vote ties → (count desc, Σdist asc, class asc).

    ``quantize=True`` ranks neighbors by floor(dist²·10⁶) instead of
    the raw double — the gate's cross-engine-exact scoring (same trick
    as the champion lists' e6 impact and IVF's fixed-point Lloyd):
    dist² ends in a float sum whose accumulation order differs between
    engines, and a last-ulp difference at the rank-k boundary flips a
    neighbor (observed: 1 of 5000 predictions at sf0.1). Quantized,
    the Σdist tie-break is an exact integer sum, order-independent.

    ``max_df`` bounds the test↔train term join — the one quadratic risk
    in the plan (a term with train-df d and test-df q fans out to d·q
    rows; a df≈N stopword makes that all-pairs). Terms whose TRAIN
    document frequency exceeds the cap are dropped from BOTH sides
    before the join, exactly the ``ops/docsim.py`` bound and for the
    same reason: stopword-tier terms appear in (nearly) every document,
    so they contribute a near-constant additive mass to every dot
    product and no discriminative distance signal. An int is an
    absolute df cap; a float in (0, 1) is a fraction of the train doc
    count, resolved in-plan (1-row broadcast — no driver action).
    Vector norms stay full-vocabulary, so kept-term weights are the
    unchanged reference representation. ``None`` = uncapped (small /
    pre-pruned corpora only)."""
    labeled = train.select(F.col("doc_id").cast("long").alias("t_id"),
                           F.col(class_col).alias("cls"))
    tv = _normalized_vectors(train, text_col).select(
        F.col("doc_id").alias("t_id"), "term", F.col("v").alias("tv")
    )
    qv = _normalized_vectors(test, text_col)

    if max_df is not None:
        tdf = tv.groupBy("term").agg(F.count("*").alias("_df"))
        if isinstance(max_df, float):
            n_train = train.select(
                F.count("*").cast("double").alias("_n"))
            kept = (
                tdf.join(F.broadcast(n_train))
                .filter(F.col("_df") <= F.lit(max_df) * F.col("_n"))
                .select("term")
            )
        else:
            kept = tdf.filter(F.col("_df") <= max_df).select("term")
        # no broadcast hint: `kept` is vocab-sized (billions of terms at
        # web scale) — let AQE pick; docsim.doc_term_weights does the same
        tv = tv.join(kept, "term")
        qv = qv.join(kept, "term")

    dots = (
        qv.join(tv, "term")
        .filter(F.col("doc_id") != F.col("t_id"))
        .groupBy("doc_id", "t_id")
        .agg(F.sum(F.col("v") * F.col("tv")).alias("dot"))
    )
    # both vectors are unit-norm: dist² = 2 − 2·dot
    dist = dots.withColumn("dist2", F.lit(2.0) - 2.0 * F.col("dot"))
    if quantize:
        dist = dist.withColumn(
            "dist2", F.floor(F.col("dist2") * 1e6).cast("long"))
    wk = Window.partitionBy("doc_id").orderBy(F.asc("dist2"), F.asc("t_id"))
    nn = (
        dist.withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") <= k)
        .join(F.broadcast(labeled), "t_id")
    )
    votes = nn.groupBy("doc_id", "cls").agg(
        F.count("*").alias("votes"), F.sum("dist2").alias("sumd")
    )
    wv = Window.partitionBy("doc_id").orderBy(
        F.desc("votes"), F.asc("sumd"), F.asc("cls")
    )
    return (
        votes.withColumn("rn", F.row_number().over(wv))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("cls").alias("pred_class"))
    )
