"""Property-based tests (hypothesis) for the pure-Python kernels that
back UDF stages — invariants that hold for ANY input, complementing
the example-based tests."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from welearn_datastack_spark.functions.udfs import (
    pack_slices,
    split_sentences,
    stub_embedder,
    stub_keyword_extractor,
)

words = st.text(alphabet="abcdefghij", min_size=1, max_size=8)
texts = st.lists(words, min_size=0, max_size=60).map(" ".join)


@given(texts, st.integers(min_value=1, max_value=10))
@settings(max_examples=200, deadline=None)
def test_pack_slices_invariants(text, slice_length):
    out = pack_slices(text, slice_length)
    if text.strip():
        assert out, "non-empty text must produce at least one slice"
    for s in out:
        body = s.rstrip("…")
        # every slice fits the word budget (truncated slices exactly hit it)
        assert len(body.split()) <= slice_length
        assert s.strip()


@given(texts)
@settings(max_examples=200, deadline=None)
def test_split_sentences_never_empty_for_nonempty(text):
    parts = split_sentences(text)
    if text.strip():
        assert parts
        for p in parts:
            assert p.strip() == p and p


@given(st.lists(texts, min_size=1, max_size=8))
@settings(max_examples=50, deadline=None)
def test_stub_embedder_unit_norm_and_deterministic(batch):
    embed = stub_embedder()
    a = embed(batch)
    b = embed(batch)
    assert np.array_equal(a, b), "embedder must be deterministic"
    assert a.dtype == np.float32 and a.shape == (len(batch), 64)
    norms = np.linalg.norm(a, axis=1)
    for t, n in zip(batch, norms):
        has_tok = any(c.isalnum() for c in t)
        if has_tok:
            assert abs(n - 1.0) < 1e-5, "non-empty text embeds to unit norm"
        else:
            assert n == 0.0


@given(texts)
@settings(max_examples=200, deadline=None)
def test_keyword_extractor_bounded_and_sorted(text):
    kws = stub_keyword_extractor(top_k=5)(text)
    assert len(kws) <= 5
    assert len(set(kws)) == len(kws), "no duplicate keywords"
    for k in kws:
        assert k == k.lower()


@given(texts, texts)
@settings(max_examples=100, deadline=None)
def test_embedder_identical_iff_same_token_bag(t1, t2):
    import re

    embed = stub_embedder()
    v = embed([t1, t2])
    bag1 = sorted(re.findall(r"\w+", t1.lower()))
    bag2 = sorted(re.findall(r"\w+", t2.lower()))
    if bag1 == bag2:
        assert np.array_equal(v[0], v[1])
