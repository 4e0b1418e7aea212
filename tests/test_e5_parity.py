"""Pinned-fixture parity test for the real E5 ONNX path (SURVEY §5.2).

Runs ONLY where onnxruntime + transformers + the model export + the
generated fixture exist; in this sandbox it skips with an actionable
reason. The fixture pins (text -> expected fairseq token ids ->
expected 384-d vector prefix) so the U2 +1 remap
(E5MultilingualEmbeddings.cs:98-111) and U6 CLS pooling (:146-170) are
asserted byte-for-byte against the reference model. Generate it with:

    python tools/gen_e5_fixture.py /path/to/model.onnx \
        intfloat/multilingual-e5-small
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import pytest

FIXTURE = Path(__file__).parent / "fixtures" / "e5_expected.json"

onnxruntime = pytest.importorskip(
    "onnxruntime",
    reason="onnxruntime not installed in this environment")
transformers = pytest.importorskip(
    "transformers",
    reason="transformers not installed in this environment")

pytestmark = pytest.mark.skipif(
    not FIXTURE.exists(),
    reason="e5_expected.json not generated — run tools/gen_e5_fixture.py "
           "with the real multilingual-e5-small ONNX export")


@pytest.fixture(scope="module")
def fixture_data():
    return json.loads(FIXTURE.read_text())


@pytest.fixture(scope="module")
def model_path():
    p = os.environ.get("E5_ONNX_MODEL")
    if not p or not Path(p).exists():
        pytest.skip("set E5_ONNX_MODEL to the model.onnx path")
    return p


def test_token_ids_match_reference_remap(fixture_data):
    """U1-U3: HF XLM-R fast-tokenizer ids must equal the pinned fairseq-
    space ids (which the reference derives via its +1 remap)."""
    from transformers import AutoTokenizer
    tok = AutoTokenizer.from_pretrained(fixture_data["model"])
    for probe in fixture_data["probes"]:
        text = probe["full_text"] or probe["text"]
        enc = tok([text], truncation=True,
                  max_length=fixture_data["max_seq_len"],
                  return_tensors="np")
        assert [int(i) for i in enc["input_ids"][0]] == probe["token_ids"]


def test_cls_vectors_match_pinned_prefixes(fixture_data, model_path):
    """U5-U7: CLS-pooled, guard-normalized vectors match the pinned
    prefixes within float32 tolerance."""
    import numpy as np
    from transformers import AutoTokenizer

    from dotnetvectorsearch_spark.embeddings.e5_math import (
        cls_pool,
        l2_normalize_guarded,
    )

    tok = AutoTokenizer.from_pretrained(fixture_data["model"])
    session = onnxruntime.InferenceSession(model_path)
    input_names = {i.name for i in session.get_inputs()}
    for probe in fixture_data["probes"]:
        text = probe["full_text"] or probe["text"]
        enc = tok([text], truncation=True,
                  max_length=fixture_data["max_seq_len"],
                  return_tensors="np")
        feeds = {"input_ids": enc["input_ids"].astype("int64"),
                 "attention_mask": enc["attention_mask"].astype("int64")}
        if "token_type_ids" in input_names:
            feeds["token_type_ids"] = np.zeros_like(feeds["input_ids"])
        (hidden,) = session.run(["last_hidden_state"], feeds)
        vec = l2_normalize_guarded(cls_pool(hidden))[0]
        np.testing.assert_allclose(
            vec[:8], probe["vector_prefix"], atol=5e-5)
        assert vec.shape[0] == probe["dim"]
        np.testing.assert_allclose(
            float(np.linalg.norm(vec)), probe["norm"], atol=1e-5)


def test_spark_udf_path_matches_direct_inference(fixture_data, model_path):
    """U8: the pandas-UDF batched path must produce the same vectors as
    single-text direct inference (pinned prefix check through Spark)."""
    from pyspark.sql import Row

    from dotnetvectorsearch_spark.embeddings.e5_onnx import E5OnnxEmbedder
    from dotnetvectorsearch_spark.session import get_spark

    spark = get_spark("e5-parity-test")
    emb = E5OnnxEmbedder(model_path, fixture_data["model"])
    texts = [(probe["full_text"] or probe["text"])
             for probe in fixture_data["probes"]]
    df = spark.createDataFrame([Row(id=i, text=t)
                                for i, t in enumerate(texts)])
    got = {r.id: r.vec for r in
           df.select("id", emb.udf()("text").alias("vec")).collect()}
    for i, probe in enumerate(fixture_data["probes"]):
        import numpy as np
        np.testing.assert_allclose(
            got[i][:8], probe["vector_prefix"], atol=5e-5)
