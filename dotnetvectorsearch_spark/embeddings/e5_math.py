"""Pure (numpy-only) pieces of the E5 inference pipeline.

Everything here is testable WITHOUT onnxruntime/transformers — the unit
tests pin the reference's semantics (the +1 token-id remap, CLS-not-mean
pooling, the 1e-12 normalize guard) against controlled fakes, and the
ONNX UDF in :mod:`e5_onnx` calls these same functions so the tested code
IS the production code.

Reference parity:

- :func:`remap_reference_token_ids` replicates
  ``E5MultilingualEmbeddings.cs:98-118`` (ProcessTokens): the reference
  tokenizes with a raw SentencePiece model whose piece ids are off by one
  from the fairseq/HF XLM-R vocabulary, so it adds +1 to every
  non-special token, maps a leading ``<s>`` to id 0, keeps special ids
  otherwise, and truncates to 512. HuggingFace's XLM-R fast tokenizer
  emits fairseq-space ids natively — :func:`remap_reference_token_ids`
  over raw SentencePiece (piece, id) pairs must equal the HF encoding of
  the same text, which is exactly what the pinned-fixture test asserts.
- :func:`cls_pool` replicates ``:146-170`` (ExtractClsEmbedding): hidden
  state row 0, NOT mean pooling (upstream E5 mean-pools; the reference
  deliberately/accidentally CLS-pools, and parity means CLS).
- :func:`l2_normalize_guarded` replicates ``:172-187``
  (NormalizeEmbedding): vectors with magnitude <= 1e-12 pass through
  UNNORMALIZED rather than dividing by ~0.
"""

from __future__ import annotations

import numpy as np

MAX_SEQ_LEN = 512       # reference E5MultilingualEmbeddings.cs:10
NORM_GUARD = 1e-12      # reference E5MultilingualEmbeddings.cs:177


def remap_reference_token_ids(tokens: list[tuple[str, int]],
                              max_length: int = MAX_SEQ_LEN) -> list[int]:
    """Map raw SentencePiece (piece, id) pairs to the fairseq/XLM-R id
    space exactly like the reference's ProcessTokens
    (``E5MultilingualEmbeddings.cs:98-118``):

    - ``<s>`` at position 0 -> 0 (the CLS id),
    - any other ``<s>`` / ``</s>`` keeps its tokenizer-assigned id,
    - every other token gets +1 (fairseq offset),
    - then truncate to ``max_length``.
    """
    ids: list[int] = []
    for idx, (piece, tok_id) in enumerate(tokens):
        if piece in ("<s>", "</s>"):
            ids.append(0 if (piece == "<s>" and idx == 0) else tok_id)
        else:
            ids.append(tok_id + 1)
    return ids[:max_length]


def cls_pool(hidden: np.ndarray) -> np.ndarray:
    """CLS pooling: hidden state row 0 per sequence — ``[B, S, H] ->
    [B, H]``. The reference pools the FIRST token, not the mask-weighted
    mean (``E5MultilingualEmbeddings.cs:146-170``)."""
    if hidden.ndim != 3:
        raise ValueError(
            f"last_hidden_state must be [batch, seq, hidden], "
            f"got shape {hidden.shape}")
    return hidden[:, 0, :].astype(np.float64)


def l2_normalize_guarded(x: np.ndarray,
                         guard: float = NORM_GUARD) -> np.ndarray:
    """Row-wise L2 normalize; rows with magnitude <= ``guard`` pass
    through unchanged (``E5MultilingualEmbeddings.cs:172-187``)."""
    x = np.asarray(x, dtype=np.float64)
    norms = np.sqrt((x ** 2).sum(axis=-1, keepdims=True))
    return np.where(norms > guard, x / np.where(norms > 0, norms, 1.0), x)
