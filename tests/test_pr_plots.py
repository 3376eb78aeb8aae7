"""Precision-recall curve output (eval/plots.py) — golden curve points
for the Cranfield query the reference plots
(main_precision_recall_single_query_turnin_with_plot.py: query[0],
K=50, per-rank recall/precision appends), the formula twin, the JSON
data artifact, and the optional-matplotlib render contract."""

import json
import os

import pytest

from searchengine_spark.eval import plots
from searchengine_spark.eval.metrics import precision_recall_curve

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference/relevance_cranfield"),
    reason="reference Cranfield corpus not present",
)

N_DOCS = 120
K = 50

# golden hit ranks on the first-120-doc Cranfield subset (29 relevant
# docs judged for query 1) — pinned from the rank-identical engine
GOLDEN_HIT_RANKS = {
    "default": [1, 2, 3, 4, 5, 6, 9, 13, 20, 42, 50],
    "tfidf": [1, 2, 3, 4, 5, 8, 10, 21, 32, 33, 45],
    "bm25": [1, 2, 3, 5, 6, 8, 24, 25, 29, 47],
    "wacky": [1, 2, 3, 4, 6, 8, 10, 25, 27, 48, 49],
}
GOLDEN_LAST_POINT = {
    "default": (11 / 29, 11 / 50),
    "tfidf": (11 / 29, 11 / 50),
    "bm25": (10 / 29, 10 / 50),
    "wacky": (11 / 29, 11 / 50),
}


@pytest.fixture(scope="module")
def cranfield(spark):
    from tools.cranfield_eval import corpus_dir, load_queries_and_qrels

    from searchengine_spark.indexing.build import build_index
    from searchengine_spark.sources.directory import load_json_directory

    queries, qrels = load_queries_and_qrels(1)
    path, is_tmp = corpus_dir(N_DOCS)
    docs = load_json_directory(spark, path)
    idx = build_index(docs, byte_size_col="byte_size", persist=True,
                      loop="stream").cache()
    stems = {
        i: int(os.path.splitext(f)[0])
        for i, f in enumerate(
            sorted(f for f in os.listdir(path) if f.endswith(".json"))
        )
    }
    yield idx, queries[0], set(qrels[0]), stems
    if is_tmp:
        import shutil

        shutil.rmtree(path, ignore_errors=True)


@pytest.fixture(scope="module")
def curves(cranfield):
    idx, query, relevant, stems = cranfield
    return plots.pr_curves_for_query(idx, query, relevant, k=K,
                                     doc_to_file=stems)


def _hit_ranks(pts):
    out, prev = [], 0.0
    for i, (r, _) in enumerate(pts, start=1):
        if r > prev:
            out.append(i)
        prev = r
    return out


def test_curve_points_match_golden(curves):
    assert set(curves) == set(GOLDEN_HIT_RANKS)
    for s, pts in curves.items():
        assert len(pts) == K
        assert _hit_ranks(pts) == GOLDEN_HIT_RANKS[s]
        r, p = pts[-1]
        gr, gp = GOLDEN_LAST_POINT[s]
        assert r == pytest.approx(gr, abs=0) and p == pytest.approx(gp, abs=0)


def test_curves_equal_formula_twin(cranfield, curves):
    from searchengine_spark.queries.ranked import rank_topk

    idx, query, relevant, stems = cranfield
    for s, pts in curves.items():
        ids = [stems[r["doc_id"]] for r in
               rank_topk(idx, query, s, K).select("doc_id").collect()]
        hits = 0
        twin = []
        for i, d in enumerate(ids, start=1):
            hits += d in relevant
            twin.append((hits / len(relevant), hits / i))
        assert pts == twin
        assert pts == precision_recall_curve(ids, relevant)


def test_json_artifact_roundtrips_with_reference_labels(curves, tmp_path):
    path = plots.write_pr_curve_data(curves, str(tmp_path))
    assert os.path.basename(path) == "Precision-Recall-Curve-Query1.json"
    data = json.load(open(path))
    # the reference's strategy labels, not the engine's
    assert set(data) == {"Default", "Traditional", "Okapi", "Wacky"}
    assert data["Okapi"] == [[r, p] for r, p in curves["bm25"]]


def test_render_contract(curves, tmp_path):
    if plots._Figure is None:
        with pytest.raises(ImportError, match="matplotlib"):
            plots.render_pr_curves(curves, str(tmp_path))
    else:  # pragma: no cover - matplotlib absent in the build container
        paths = plots.render_pr_curves(curves, str(tmp_path))
        assert sorted(os.path.basename(p) for p in paths) == sorted(
            f"Precision-Recall-Curve-{lbl}-Query1.png"
            for lbl in ("Default", "Traditional", "Okapi", "Wacky")
        )
        assert all(os.path.getsize(p) > 0 for p in paths)
