"""Unit tests for the pure E5 pipeline math (U2 remap, U6 CLS pooling,
U7 normalize guard) — no onnxruntime needed: these pin the reference
semantics (E5MultilingualEmbeddings.cs:98-187) against controlled fakes,
and e5_onnx.py routes its real inference through the SAME functions."""

from __future__ import annotations

import numpy as np
import pytest

from dotnetvectorsearch_spark.embeddings.e5_math import (
    cls_pool,
    l2_normalize_guarded,
    remap_reference_token_ids,
)


def test_remap_plus_one_and_leading_cls():
    # Raw SentencePiece pieces with their sp ids; fairseq/XLM-R space is
    # sp_id + 1 for normal pieces, 0 for the leading <s> (CLS).
    toks = [("<s>", 0), ("▁hello", 10499), ("▁world", 8998),
            ("</s>", 2)]
    assert remap_reference_token_ids(toks) == [0, 10500, 8999, 2]


def test_remap_mid_sequence_special_keeps_id():
    # Reference quirk (E5MultilingualEmbeddings.cs:103-108): only a
    # LEADING <s> maps to 0; a mid-sequence <s> keeps its raw id, and
    # </s> always keeps its id.
    toks = [("<s>", 0), ("▁a", 5), ("<s>", 0), ("</s>", 2)]
    assert remap_reference_token_ids(toks) == [0, 6, 0, 2]


def test_remap_truncates_to_max_length():
    toks = [("<s>", 0)] + [("▁t", 100)] * 600
    ids = remap_reference_token_ids(toks, max_length=512)
    assert len(ids) == 512
    assert ids[0] == 0 and set(ids[1:]) == {101}


def test_cls_pool_is_first_token_not_mean():
    hidden = np.zeros((2, 3, 4))
    hidden[0, 0] = [1.0, 2.0, 3.0, 4.0]   # CLS row
    hidden[0, 1] = [100.0] * 4            # would dominate a mean pool
    hidden[1, 0] = [5.0, 6.0, 7.0, 8.0]
    pooled = cls_pool(hidden)
    assert pooled.shape == (2, 4)
    np.testing.assert_array_equal(pooled[0], [1.0, 2.0, 3.0, 4.0])
    np.testing.assert_array_equal(pooled[1], [5.0, 6.0, 7.0, 8.0])
    assert not np.allclose(pooled[0], hidden[0].mean(axis=0))


def test_cls_pool_rejects_non_3d():
    with pytest.raises(ValueError, match="batch, seq, hidden"):
        cls_pool(np.zeros((3, 4)))


def test_l2_guard_passes_zero_vector_through():
    # Reference guard (:177): magnitude <= 1e-12 -> UNNORMALIZED copy,
    # not a divide-by-zero NaN.
    x = np.array([[3.0, 4.0], [0.0, 0.0], [1e-13, 0.0]])
    out = l2_normalize_guarded(x)
    np.testing.assert_allclose(out[0], [0.6, 0.8])
    np.testing.assert_array_equal(out[1], [0.0, 0.0])
    np.testing.assert_array_equal(out[2], [1e-13, 0.0])
    assert np.isfinite(out).all()
