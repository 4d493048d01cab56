"""Round-15 depth pins: independent references for the three new
operator families (SURVEY follow-ups closed this round).

The oracle sweeps already gate each registered query against a DuckDB
SQL twin; these tests triangulate with a THIRD, non-SQL reference —
a pure-Python Sennrich-BPE for the tokenizer-apply path, the
brute-force grouped search as the recall yardstick for the IVF serve
path, and hypothesis fuzz for the byte-header image parser — so a
bug shared by the Spark code and its SQL twin still gets caught."""

from __future__ import annotations

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from welearn_datastack_spark.plans.registry import all_queries


# --- BPE encode vs an independent pure-Python Sennrich reference ------


def _ref_bpe_doc_counts(rows: list[dict]) -> dict:
    """Pure-Python Sennrich BPE, 3 merge rounds, same conventions as
    the engine: ASCII \\w+ lowercased words, pair counts weighted by
    word frequency, argmax by (cnt DESC, left, right), greedy
    left-to-right fold where a just-merged token never re-merges
    within its round."""
    vocab: Counter = Counter()
    doc_words: dict = {}
    for row in rows:
        ws = re.findall(r"[A-Za-z0-9_]+", row["text"].lower())
        doc_words[row["doc_id"]] = ws
        vocab.update(ws)
    seqs = {w: list(w) for w in vocab}
    for _ in range(3):
        pc: Counter = Counter()
        for w, n in vocab.items():
            s = seqs[w]
            for a, b in zip(s, s[1:]):
                pc[(a, b)] += n
        if not pc:
            break
        (left, right), _cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merged = left + right
        for w, s in seqs.items():
            out = [s[0]]
            for x in s[1:]:
                if out[-1] == left and x == right:
                    out[-1] = merged
                else:
                    out.append(x)
            seqs[w] = out
    return {
        d: (len(ws), sum(len(seqs[w]) for w in ws))
        for d, ws in doc_words.items()
    }


def test_bpe_encode_corpus_matches_pure_python_reference(spark, sf_dir):
    """Every per-doc (n_words, n_bpe_tokens) must agree with the
    independent Python implementation — merge choice, tie-break, fold
    semantics, and the corpus join-back all pinned at once."""
    import pyarrow.parquet as pq

    rows = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).to_pylist()
    ref = _ref_bpe_doc_counts(rows)
    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in all_queries()["bpe_encode_corpus"](spark, sf_dir).collect()
    }
    assert got == ref


# --- grouped IVF serve: brute force is the recall yardstick -----------


def test_ivf_grouped_topk_recall_and_exact_scoring(spark, sf_dir):
    """Two invariants of the bucketed grouped serve path vs the
    brute-force grouped_vector_search (same vec_id<10 / >=10 split,
    same group column, same k_groups=3):

    - scoring is EXACT on probed candidates: any (q_id, c_id) the IVF
      path returns must carry the identical rounded cosine the brute
      force computed — IVF approximates candidate COVERAGE, never the
      score;
    - coverage is real: recall@3-groups stays above the floor the
      2-probe/8-list geometry implies (measured 0.433 on the fixture;
      0.30 leaves regeneration margin without ever passing on a
      broken probe join, which reads ~0.1 = chance)."""
    queries = all_queries()
    bf = queries["grouped_vector_search"](spark, sf_dir).collect()
    iv = queries["ivf_grouped_topk"](spark, sf_dir).collect()
    assert iv, "ivf_grouped_topk returned no rows"

    bf_cos = {(r["q_id"], r["c_id"]): r["cosine"] for r in bf}
    bf_groups: dict = {}
    iv_groups: dict = {}
    for r in bf:
        bf_groups.setdefault(r["q_id"], set()).add(r["label"])
    for r in iv:
        iv_groups.setdefault(r["q_id"], set()).add(r["label"])
        assert len(iv_groups[r["q_id"]]) <= 3
        key = (r["q_id"], r["c_id"])
        if key in bf_cos:
            assert r["cosine"] == pytest.approx(bf_cos[key], abs=1e-6)

    hits = sum(len(bf_groups[q] & iv_groups.get(q, set())) for q in bf_groups)
    total = sum(len(v) for v in bf_groups.values())
    assert hits / total >= 0.30, f"grouped recall {hits / total:.3f}"


# --- image-header parser: fuzz (the 100 TB dead-letter contract) ------


def test_parse_image_header_fuzz_never_raises():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from welearn_datastack_spark.operators.multimodal import parse_image_header

    @settings(max_examples=300, deadline=None)
    @given(st.binary(max_size=256))
    def check(payload):
        w, h, fmt = parse_image_header(payload)
        # total contract: garbage → the dead-letter triple; anything
        # accepted must carry positive dims and a known format
        if fmt is None:
            assert (w, h) == (None, None)
        else:
            assert fmt in ("png", "jpeg") and w > 0 and h > 0

    check()


def test_parse_image_header_truncation_fuzz():
    """Any prefix of a valid payload either parses to the SAME
    dimensions (header fully inside the prefix) or dead-letters —
    never to different dimensions. This is the property that makes
    corrupt-tail multi-GB objects safe to route at scale."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from welearn_datastack_spark.operators.multimodal import parse_image_header

    from .test_round15 import _valid_jpeg, _valid_png

    @settings(max_examples=200, deadline=None)
    @given(
        st.integers(min_value=1, max_value=4096),
        st.integers(min_value=1, max_value=4096),
        st.booleans(),
        st.integers(min_value=0, max_value=64),
    )
    def check(w, h, use_png, cut):
        full = _valid_png(w, h) if use_png else _valid_jpeg(w, h)
        fmt_full = parse_image_header(full)
        assert fmt_full == (w, h, "png" if use_png else "jpeg")
        got = parse_image_header(full[: max(0, len(full) - cut)])
        assert got in (fmt_full, (None, None, None))

    check()
