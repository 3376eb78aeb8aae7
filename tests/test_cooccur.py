"""Windowed co-occurrence + PMI (ops/cooccur.py) vs a Python replay."""

import math
import re
from collections import Counter


def _docs(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )


def _py_pairs(texts, window):
    pairs = Counter()
    for t in texts:
        ts = re.findall(r"[a-z0-9]+", t.lower())
        for i, a in enumerate(ts):
            for d in range(1, window + 1):
                if i + d < len(ts):
                    pairs[(a, ts[i + d])] += 1
    return pairs


def test_windowed_pairs_matches_python(spark):
    from searchengine_spark.ops.cooccur import windowed_pairs

    texts = ["a b c a b", "b c d", "x", ""]
    got = {
        (r["term_a"], r["term_b"]): r["n_cooc"]
        for r in windowed_pairs(_docs(spark, texts), window=2).collect()
    }
    assert got == dict(_py_pairs(texts, 2))


def test_pmi_values(spark):
    from searchengine_spark.ops.cooccur import pmi_table

    # "new york" always adjacent (5 times); unigrams: new=5, york=5,
    # other tokens pad N. window=1, min_count=5 keeps exactly that pair.
    texts = ["new york " + "pad%d " % i for i in range(5)]
    rows = pmi_table(_docs(spark, texts), window=1, min_count=5).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["term_a"], r["term_b"], r["n_cooc"]) == ("new", "york", 5)
    n_total = 15  # 3 tokens per doc x 5 docs
    assert abs(r["pmi"] - math.log(5 * n_total / (5 * 5))) < 1e-12
