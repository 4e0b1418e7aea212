"""Generate the pinned E5 parity fixture (SURVEY.md §5.2).

Run this WHERE onnxruntime + transformers + the intfloat/
multilingual-e5-small ONNX export are available (they are NOT in the CI
sandbox — tests/test_e5_parity.py skips with a pointer here until the
fixture exists):

    python tools/gen_e5_fixture.py /path/to/model.onnx \
        intfloat/multilingual-e5-small

Writes ``tests/fixtures/e5_expected.json`` with, per probe text:

- ``text``: the input (after the reference's "passage: " prefixing),
- ``token_ids``: the full fairseq-space input_ids row — pins U1-U3
  (SentencePiece tokenize, +1 remap, truncation),
- ``vector_prefix``: first 8 dims of the CLS-pooled L2-normalized
  embedding — pins U5-U7 byte-for-byte (within float32 tolerance),
- ``dim`` and ``norm`` as sanity anchors.

The probe set covers ASCII, multilingual text (the model is
multilingual-e5), an empty-ish string, and a >512-token truncation case.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

PROBES = [
    "passage: How do I cancel my hotel booking? : Log into your account.",
    "query: hotel cancellation policy",
    "passage: Herzlich willkommen! Wie kann ich Ihnen helfen?",
    "passage: ",
    "passage: " + "token " * 600,  # truncation case (U3)
]


def main(model_path: str, tokenizer_ref: str) -> None:
    import numpy as np
    import onnxruntime as ort
    from transformers import AutoTokenizer

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from dotnetvectorsearch_spark.embeddings.e5_math import (
        MAX_SEQ_LEN,
        cls_pool,
        l2_normalize_guarded,
    )

    tokenizer = AutoTokenizer.from_pretrained(tokenizer_ref)
    session = ort.InferenceSession(model_path)
    input_names = {i.name for i in session.get_inputs()}

    out = []
    for text in PROBES:
        enc = tokenizer([text], truncation=True, max_length=MAX_SEQ_LEN,
                        return_tensors="np")
        feeds = {"input_ids": enc["input_ids"].astype("int64"),
                 "attention_mask": enc["attention_mask"].astype("int64")}
        if "token_type_ids" in input_names:
            feeds["token_type_ids"] = np.zeros_like(feeds["input_ids"])
        (hidden,) = session.run(["last_hidden_state"], feeds)
        vec = l2_normalize_guarded(cls_pool(hidden))[0].astype(np.float32)
        out.append({
            "text": text if len(text) < 200 else text[:40] + "...TRUNC600",
            "full_text": None if len(text) < 200 else text,
            "token_ids": [int(i) for i in enc["input_ids"][0]],
            "vector_prefix": [round(float(x), 6) for x in vec[:8]],
            "dim": int(vec.shape[0]),
            "norm": round(float(np.linalg.norm(vec.astype(np.float64))), 6),
        })

    dest = (Path(__file__).resolve().parent.parent
            / "tests" / "fixtures" / "e5_expected.json")
    dest.parent.mkdir(parents=True, exist_ok=True)
    dest.write_text(json.dumps(
        {"model": tokenizer_ref, "max_seq_len": MAX_SEQ_LEN,
         "probes": out}, indent=2))
    print(f"wrote {dest} ({len(out)} probes)")


if __name__ == "__main__":
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    main(sys.argv[1], sys.argv[2])
