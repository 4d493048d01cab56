"""Embedding binary codec — float32 little-endian bytes ↔
``array<float>``.

The reference stores slice embeddings as raw float32 LE bytes in a
LargeBinary column (encode: ``embedding.tobytes()``,
modules/embedding_model_helpers.py:111–121; decode:
``numpy.frombuffer(..., dtype=numpy.float32)``,
modules/sdgs_classifiers.py:39–41). SURVEY.md §7 flags the round-trip
as an exact-parity risk: inside the engine embeddings live as
``array<float>`` (Arrow-friendly, zip_with-able); the byte form exists
ONLY at storage/exchange boundaries (JDBC, Qdrant payloads).

Arrow-batched pandas UDFs; numpy does the packing per batch, so the
cost is one buffer copy per Arrow chunk, not per row.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T


@F.pandas_udf(T.BinaryType())
def embedding_to_bytes(vecs: pd.Series) -> pd.Series:
    """array<float> → float32 LE bytes (reference
    embedding_model_helpers.py:111–121)."""
    return vecs.map(
        lambda v: None if v is None else np.asarray(v, dtype="<f4").tobytes()
    )


@F.pandas_udf(T.ArrayType(T.FloatType()))
def bytes_to_embedding(blobs: pd.Series) -> pd.Series:
    """float32 LE bytes → array<float> (reference
    sdgs_classifiers.py:39–41)."""
    return blobs.map(
        lambda b: None if b is None else np.frombuffer(b, dtype="<f4")
    )
