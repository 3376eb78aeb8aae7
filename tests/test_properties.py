"""Property-based tests (hypothesis) for the pure kernels: tokenizer
invariants, VB/delta codec roundtrips, eval metrics bounds."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from searchengine_spark.eval.metrics import average_precision
from searchengine_spark.indexing.vb import (
    delta_decode,
    delta_encode,
    vb_decode,
    vb_encode,
)
from searchengine_spark.text.tokenizer import (
    analyze_document,
    english_tokens,
    process_token,
)

texts = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=300
)


@settings(max_examples=200, deadline=None)
@given(texts)
def test_english_tokens_never_empty_or_spacey(t):
    for tok in english_tokens(t):
        assert tok == tok.strip() and tok != ""
        assert " " not in tok


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=60))
def test_process_token_output_shape(tok):
    out = process_token(tok)
    assert isinstance(out, list) and len(out) >= 1
    for term in out:
        assert "'" not in term and '"' not in term
        assert term == term.lower() or not term.isalpha()


@settings(max_examples=100, deadline=None)
@given(texts)
def test_analyze_document_invariants(t):
    ana = analyze_document(t)
    toks = english_tokens(t)
    assert ana.doc_length == max(len(toks), 1)
    # positions are 1-based and bounded by token count
    for _, pos in ana.term_positions:
        assert 1 <= pos <= max(len(toks), 1)
    # 1-token docs emit nothing (reference pairwise-loop quirk)
    if len(toks) == 1:
        assert ana.term_positions == []
    assert sum(ana.term_tftd.values()) == len(ana.term_positions)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=1 << 45), max_size=80))
def test_vb_roundtrip_property(vals):
    arr = np.array(vals, dtype=np.int64)
    assert list(vb_decode(vb_encode(arr))) == vals


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=1 << 40), max_size=60))
def test_delta_roundtrip_property(vals):
    s = np.sort(np.array(vals, dtype=np.int64))
    assert list(delta_decode(delta_encode(s))) == list(s)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(0, 50), max_size=30, unique=True),
    st.sets(st.integers(0, 50), max_size=20),
)
def test_average_precision_bounds(ranked, relevant):
    ap = average_precision(ranked, relevant)
    assert 0.0 <= ap <= 1.0
    # perfect ranking of the full relevant set gives AP = 1
    if relevant:
        assert average_precision(sorted(relevant), relevant) == 1.0


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(0, 30), max_size=20, unique=True),
    st.sets(st.integers(0, 30), max_size=15),
)
def test_precision_recall_curve_properties(ranked, relevant):
    from searchengine_spark.eval.metrics import precision_recall_curve

    pts = precision_recall_curve(ranked, relevant)
    assert len(pts) == len(ranked)
    last_recall = 0.0
    for recall, precision in pts:
        assert 0.0 <= precision <= 1.0 and 0.0 <= recall <= 1.0
        assert recall >= last_recall  # recall is monotone
        last_recall = recall
