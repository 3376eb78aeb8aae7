"""Sparse-cosine document similarity (ops/docsim.py) vs a pure-Python
replay, plus the df-cap contract."""

import math
from collections import Counter, defaultdict


def _py_cosine_pairs(texts, max_df=100, threshold=0.0):
    import re

    toks = {i: re.findall(r"[a-z0-9]+", t.lower()) for i, t in texts.items()}
    tftd = {i: Counter(ts) for i, ts in toks.items()}
    df = Counter()
    for c in tftd.values():
        df.update(c.keys())
    w = {
        i: {t: 1.0 + math.log(n) for t, n in c.items() if df[t] <= max_df}
        for i, c in tftd.items()
    }
    norm = {i: math.sqrt(sum(v * v for v in ws.values())) for i, ws in w.items()}
    out = {}
    ids = sorted(texts)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            dot = sum(w[a][t] * w[b].get(t, 0.0) for t in w[a])
            if dot and norm[a] and norm[b]:
                c = dot / (norm[a] * norm[b])
                if c >= threshold:
                    out[(a, b)] = c
    return out


def _docs(spark, texts):
    return spark.createDataFrame(
        sorted(texts.items()), "doc_id long, text string"
    )


def test_cosine_matches_python_replay(spark):
    from searchengine_spark.ops.docsim import sparse_cosine_pairs

    texts = {
        1: "apple banana cherry apple",
        2: "apple banana banana date",
        3: "cherry date elderberry fig",
        4: "totally unrelated words only here",
    }
    got = {
        (r["doc_a"], r["doc_b"]): r["cosine"]
        for r in sparse_cosine_pairs(_docs(spark, texts), threshold=0.0).collect()
    }
    want = _py_cosine_pairs(texts)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12


def test_df_cap_drops_stopword_terms(spark):
    from searchengine_spark.ops.docsim import sparse_cosine_pairs

    # "the" appears in all 4 docs; with max_df=3 it contributes nothing,
    # so docs sharing ONLY "the" produce no pair at threshold 0.01
    texts = {
        1: "the apple",
        2: "the banana",
        3: "the cherry",
        4: "the apple",
    }
    got = {
        (r["doc_a"], r["doc_b"])
        for r in sparse_cosine_pairs(
            _docs(spark, texts), max_df=3, threshold=0.01
        ).collect()
    }
    assert got == {(1, 4)}  # identical after the cap; cosine 1.0
