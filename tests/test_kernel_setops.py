"""Property tests for the round-5 eval-kernel set-op primitives against
their numpy reference implementations — these replaced
np.intersect1d/np.isin/np.union1d in every hot path, so a subtle
off-by-one in the searchsorted forms would corrupt match sets silently."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from ds_discovery_opensearch_taxonomy_spark.operators.search import (
    _andnot,
    _intersect_add,
    _intersect_sorted,
    _member_mask,
    _union_add_many,
    _union_ids_many,
)

ids_arrays = st.lists(
    st.integers(min_value=-(2**40), max_value=2**40), max_size=60
).map(lambda xs: np.unique(np.array(xs, dtype=np.int64)))


@given(ids_arrays, ids_arrays)
@settings(max_examples=200, deadline=None)
def test_member_mask_matches_isin(a, b):
    mask, idx = _member_mask(a, b)
    ref = np.isin(a, b, assume_unique=True)
    assert (mask == ref).all()
    # positions are correct wherever the mask is set
    if mask.any():
        assert (b[idx[mask]] == a[mask]).all()


@given(ids_arrays, ids_arrays)
@settings(max_examples=200, deadline=None)
def test_intersect_sorted_matches_intersect1d(a, b):
    got = _intersect_sorted(a, b)
    ref = np.intersect1d(a, b, assume_unique=True)
    assert (got == ref).all()


@given(ids_arrays, ids_arrays)
@settings(max_examples=200, deadline=None)
def test_intersect_add_matches_reference(a, b):
    sa = np.arange(len(a), dtype=np.float64) + 1.0
    sb = np.arange(len(b), dtype=np.float64) * 2.0 + 1.0
    ids, sc = _intersect_add(a, sa, b, sb)
    common, ia, ib = np.intersect1d(
        a, b, assume_unique=True, return_indices=True
    )
    order = np.argsort(common)
    assert (ids == common[order]).all()
    assert np.allclose(sc, (sa[ia] + sb[ib])[order])


@given(ids_arrays, ids_arrays)
@settings(max_examples=200, deadline=None)
def test_andnot_matches_reference(a, b):
    sa = np.arange(len(a), dtype=np.float64)
    ids, sc = _andnot(a, sa, b)
    keep = ~np.isin(a, b, assume_unique=True)
    assert (ids == a[keep]).all()
    assert (sc == sa[keep]).all()


@given(st.lists(ids_arrays, max_size=8))
@settings(max_examples=150, deadline=None)
def test_union_add_many_matches_iterative(parts):
    pairs = [
        (p, (np.arange(len(p), dtype=np.float64) + 0.5) * (i + 1))
        for i, p in enumerate(parts)
    ]
    ids, sc = _union_add_many(pairs)
    # reference: dict accumulation
    acc: dict[int, float] = {}
    for p, s in pairs:
        for v, x in zip(p.tolist(), s.tolist()):
            acc[v] = acc.get(v, 0.0) + x
    ref_ids = np.array(sorted(acc), dtype=np.int64)
    assert (ids == ref_ids).all()
    assert np.allclose(sc, [acc[v] for v in ref_ids.tolist()])


@given(st.lists(ids_arrays, max_size=8))
@settings(max_examples=150, deadline=None)
def test_union_ids_many_matches_union1d(parts):
    got = _union_ids_many(parts)
    ref = np.array([], dtype=np.int64)
    for p in parts:
        ref = np.union1d(ref, p)
    assert (got == ref).all()


def _mk_evaluator(term_positions, scored):
    """Evaluator with the decode cache seeded directly (no Spark rows):
    term_positions = {term: {doc_ord: [positions...]}}."""
    from ds_discovery_opensearch_taxonomy_spark.functions.vtokenize import (
        term_id_of,
    )
    from ds_discovery_opensearch_taxonomy_spark.operators.search import (
        _Evaluator,
        _TermData,
    )

    tid_map = {}
    ev = _Evaluator(
        rows_by_term={}, df_map={}, n_docs=1000.0, k1=1.2, b=0.75,
        avgdl={"text": 10.0}, scored=scored, needs_pos=True,
        tid_map=tid_map,
    )
    for term, docs in term_positions.items():
        tid = term_id_of("text", term)
        tid_map[("text", term)] = tid
        ids = np.array(sorted(docs), dtype=np.int64)
        pos_lists = [sorted(set(docs[d])) for d in ids.tolist()]
        tfs = np.array([len(p) for p in pos_lists], dtype=np.int64)
        po = np.concatenate([[0], np.cumsum(tfs)]).astype(np.int64)
        pf = (
            np.concatenate([np.array(p, dtype=np.int64) for p in pos_lists])
            if pos_lists
            else np.empty(0, dtype=np.int64)
        )
        ev.terms[tid] = _TermData(ids, tfs, po, pf)
    return ev


@given(
    st.dictionaries(
        st.sampled_from(["alpha", "beta", "gamma"]),
        st.dictionaries(
            st.integers(min_value=0, max_value=40),
            st.lists(
                st.integers(min_value=0, max_value=30),
                min_size=1, max_size=6,
            ),
            min_size=1, max_size=12,
        ),
        min_size=2, max_size=3,
    ),
    st.integers(min_value=1, max_value=5),
)
@settings(max_examples=250, deadline=None)
def test_sloppy_phrase_bool_existence_matches_advance_min(tp, slop):
    """DIFFERENTIAL: the round-5 vectorized window-existence test (bool
    mode, smallest-range argument over cached occurrence keys) must agree
    doc-for-doc with the per-doc advance-min reference the scored path
    still runs (freq > 0)."""
    from ds_discovery_opensearch_taxonomy_spark.plans.queryparser import (
        PhraseNode,
    )

    terms = sorted(tp)[:2]
    node = PhraseNode("text", tuple((t,) for t in terms), slop=slop)
    ids_bool, _ = _mk_evaluator(tp, scored=False)._eval_phrase(node)
    ids_scored, _ = _mk_evaluator(tp, scored=True)._eval_phrase(node)
    assert ids_bool.tolist() == ids_scored.tolist()

    # exact phrases must agree too (cached-key chain vs run-length freqs)
    node0 = PhraseNode("text", tuple((t,) for t in terms), slop=0)
    b0, _ = _mk_evaluator(tp, scored=False)._eval_phrase(node0)
    s0, _ = _mk_evaluator(tp, scored=True)._eval_phrase(node0)
    assert b0.tolist() == s0.tolist()
