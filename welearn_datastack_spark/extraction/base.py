"""Shared extraction helpers (Column-level and plain-Python, the
latter for use inside Arrow-batched pandas UDFs)."""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# ref regular_expression.py:7 — \n \t \r, REMOVED (not spaced)
_BACKLINES = re.compile(r"[\n\t\r]")


def ref_clean_return_to_line(col: Column) -> Column:
    """The reference's exact ``clean_return_to_line``
    (scraping_utils.py:111-115): REMOVE backline characters and strip.
    NOTE: functions/text.clean_return_to_line (F3) replaces them with
    a space — a round-1 documented deviation kept for its registered
    oracle queries; extraction plugins need byte parity with the
    reference's fixtures, hence this variant."""
    return F.trim(F.regexp_replace(col, r"[\n\t\r]", ""))


def ref_clean_return_to_line_py(s: str | None) -> str | None:
    """Python twin of ref_clean_return_to_line for pandas-UDF plugins."""
    if not isinstance(s, str):
        return s
    return _BACKLINES.sub("", s).strip()


def clean_doi_py(doi: str | None) -> str | None:
    """Python twin of functions/text.clean_doi
    (ref scraping_utils.py:173-183: strips the literal
    ``https://doi.org/`` prefix only)."""
    if not isinstance(doi, str):
        return doi
    return doi.replace("https://doi.org/", "") if doi.startswith("https://doi.org/") else doi
