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


def test_bigram_logprob_values(spark):
    from searchengine_spark.ops.textstats import bigram_logprob

    # corpus: "a b" x2, "a c", "z"; N=7 tokens, n(a)=3, n(b)=2, n(c)=1,
    # nab(a,b)=2, nab(a,c)=1
    texts = ["a b", "a b", "a c", "z"]
    out = {r["doc_id"]: r for r in bigram_logprob(_docs(spark, texts)).collect()}
    lp_ab = math.log(0.9 * 2 / 3 + 0.1 * 2 / 7)
    lp_ac = math.log(0.9 * 1 / 3 + 0.1 * 1 / 7)
    assert out[0]["n_bigrams"] == 1
    assert abs(out[0]["mean_logprob"] - lp_ab) < 1e-12
    assert abs(out[2]["mean_logprob"] - lp_ac) < 1e-12
    assert out[3]["n_bigrams"] == 0 and out[3]["mean_logprob"] is None
    # repetitive text scores higher than novel transitions
    assert out[0]["mean_logprob"] > out[2]["mean_logprob"]


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
