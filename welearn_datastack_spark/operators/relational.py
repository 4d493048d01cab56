"""Join / set-operation patterns from the reference (SURVEY.md §2.3/§2.7).

All joins in the reference are equi-joins sent to Postgres; here they
are declared on DataFrames and Catalyst/AQE picks broadcast vs
sort-merge. Dimension sides (corpus, models, keyword dictionary) are
small by construction → ``F.broadcast`` them explicitly so the plan is
shuffle-free on the big side even before AQE kicks in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def semi_join(facts: DataFrame, probe: DataFrame, on: list[str] | str) -> DataFrame:
    """Rows of ``facts`` with ≥1 match in ``probe`` (reference J6,
    retrieve_data_from_database.py:386–403 — documents whose latest
    state ∈ steps ∩ id-list)."""
    return facts.join(probe, on=on, how="left_semi")


def anti_join(facts: DataFrame, probe: DataFrame, on: list[str] | str) -> DataFrame:
    """Rows of ``facts`` with no match in ``probe`` (reference J7/J11 —
    non-SDG set difference, NOT EXISTS backfill SQL)."""
    return facts.join(probe, on=on, how="left_anti")


def get_or_create(
    dim: DataFrame,
    incoming: DataFrame,
    key: str,
    id_col: str = "id",
) -> DataFrame:
    """Keyword-style get-or-create (reference J8,
    nodes_workflow/KeywordsExtractor/keywords_extractor.py:91–101:
    probe the unique-text dictionary, reuse the id, else create).

    MERGE-style and idempotent: new keys get a *deterministic* id
    (md5 of the key) instead of the reference's DB-generated UUID, so
    re-running the job converges instead of relying on transactional
    INSERT + unique-constraint rollback. Returns the updated dimension
    (existing ∪ created).
    """
    incoming_keys = incoming.select(key).dropDuplicates([key])
    created = incoming_keys.join(dim.select(key), on=key, how="left_anti").withColumn(
        id_col, F.md5(F.col(key))
    )
    return dim.select(key, id_col).unionByName(created.select(key, id_col))


def overwrite_by_key(existing: DataFrame, incoming: DataFrame, key: str) -> DataFrame:
    """Delete-then-upsert ≡ overwrite-by-key (reference S16, the Qdrant
    sink: delete points whose payload document_id is in the batch, then
    upsert the new points — modules/qdrant_handler.py:68–111 +
    qdrant_syncronizer.py:185–189). Pure-DataFrame MERGE:
    anti-join out the replaced keys, union the new rows.
    """
    return existing.join(incoming.select(key).dropDuplicates([key]), on=key, how="left_anti").unionByName(
        incoming
    )
