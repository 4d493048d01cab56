"""Details-JSON merge write-back — the reference's per-plugin
``document.details[key] = value`` + ``flag_modified`` pattern
(modules/computed_metadata.py:225-273: compute_duration /
compute_readability set keys, skipping ones already present unless
``strict``; plugins merge per-source keys the same way,
e.g. plugins/rest_requesters/hal.py:141-148).

Spark-first shape: every update VALUE is computed as a Column
(JVM-side — predict_duration, predict_readability, etc.); the updates
are packed into ONE ``to_json(struct(...))`` string per row, and a
single Arrow-batched pandas UDF does the only part Catalyst cannot —
the key-wise JSON-tree merge — with stdlib ``json``. Type fidelity is
exact: values nest as real JSON (arrays/objects/numbers), not
stringified fragments.
"""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def merge_details(
    df: DataFrame,
    updates: dict[str, Column],
    details_col: str = "details",
    strict: bool = False,
) -> DataFrame:
    """Merge ``updates`` into the JSON-string ``details_col``.

    ``strict=False`` (reference default): a key already present in the
    document's details is left untouched (computed_metadata.py:251-252
    ``if not strict and "duration" in document.details: return``).
    ``strict=True``: recompute/overwrite.

    Null/empty/corrupt details start from ``{}`` (the reference's ORM
    default); an update column that evaluates to SQL NULL writes JSON
    ``null`` only under ``strict`` and is skipped otherwise (matching
    the reference, which simply would not call the setter).
    """
    keys = list(updates)

    @F.pandas_udf(T.StringType())
    def _merge(details, packed):  # type: ignore[no-untyped-def]
        out = []
        for det, upd in zip(details, packed):
            try:
                base = json.loads(det) if det else {}
                if not isinstance(base, dict):
                    base = {}
            except (TypeError, ValueError):
                base = {}
            new = json.loads(upd) if upd else {}
            for k in keys:
                v = new.get(k)
                if strict:
                    base[k] = v
                elif k not in base and v is not None:
                    base[k] = v
            out.append(json.dumps(base, ensure_ascii=False))
        import pandas as pd

        return pd.Series(out)

    packed = F.to_json(F.struct(*[c.alias(k) for k, c in updates.items()]))
    return df.withColumn(details_col, _merge(F.col(details_col), packed))
