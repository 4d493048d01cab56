"""UVED extraction — maps UVED member-API JSON to WeLearn document
fields, including the ISCED scholar-metadata taxonomy.

Reference: ``plugins/rest_requesters/uved.py`` — ``run`` (:408-495),
``_extract_metadata`` (:330-398), category filters
``_extract_specific_metadata`` (:58-70), license assembly from
category uids ``_extract_licence`` (:152-173), ISCED level/field
maps (:72-137), activity types (:196-231), SDG ids (:245-262),
institution types (:264-308); ``clean_text`` from
``modules/scraping_utils.py:118-130``.

The mapping is dictionary-heavy tree logic over one JSON document per
row, so it runs as an Arrow-batched pandas UDF in ``mapInPandas`` —
stdlib only, no per-row JVM↔Python round-trips. The details struct is
emitted as a JSON string: its shape is plugin-specific and
map-merged downstream (see operators' details-merge), exactly like
the reference's JSONB column.
"""

from __future__ import annotations

import json
import re
from collections.abc import Iterator
from html import unescape
from html.parser import HTMLParser
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

# ref uved.py:75-85
_LEVEL_ISCED = {
    "bac": 344, "bac+1": 541, "bac+2": 641, "bac+3": 665, "bac+4": 761,
    "bac+5": 766, "bac+6": 767, "bac+7": 861, "bac+8": 864, "du": 544,
}
# ref uved.py:103-125
_FIELD_ISCED = {
    "droit": "0421", "economie": "0311", "gestion": "0410",
    "economie et gestion": "0400", "science politique": "0312",
    "sciences sanitaires et sociales": "0910", "histoire": "0222",
    "géographie et aménagement": "0319", "psychologie": "0313",
    "sciences de l'éducation": "0111", "philosophie": "0223",
    "sciences sociales": "0310",
    "sciences de l’homme, anthropologie, ethnologie": "0314",
    "mathématiques": "0541", "physique": "0533", "physique, chimie": "0530",
    "sciences de la vie": "0511", "sciences de la terre": "0532",
    "sciences de la vie et de la terre": "0510", "génie civil": "0732",
    "sciences pour l'ingénieur": "0700",
}
# ref uved.py:199-219
_ACTIVITY_TYPES = {
    "cours": "course", "exercice": "exercise", "activités": "activity",
    "animation": "workshop", "autoévaluation": "self-assessment",
    "documentaire": "documentary", "étude de cas": "case study",
    "évaluation": "assessment", "lecture": "reading", "outil": "tool",
    "parcours de formation": "learning path", "présentation": "presentation",
    "questionnaire": "quiz", "scénario pédagogique": "learning scenario",
    "simulation": "simulation",
    "entretiens et témoignages": "interviews and testimonials",
    "démonstration": "demonstration", "glossaire": "glossary",
    "directs": "live session",
}
# ref uved.py:157-162
_LICENSE_UID_CC = {8: "by", 6: "sa", 13: "nd", 9: "nc"}
# ref uved.py:292-306 (match statement). Deviation (documented): the
# reference's `case "grande Ecole, ecole d’ingénieurs"` can never
# match its lowercased subject — fixed to lowercase here, so SEL
# institutions map instead of being silently dropped.
_INSTITUTION_TYPES = {
    "grande ecole, ecole d’ingénieurs": ("SEL", [7]),
    "université": ("UNI", [6, 7, 8]),
    "ecole de commerce": ("BUS", [6, 7]),
    "autre établissement": ("OTHER", []),
}


class _HTMLTagRemover(HTMLParser):
    """ref scraping_utils.py:14-23."""

    def __init__(self) -> None:
        super().__init__()
        self.result: list[str] = []

    def handle_data(self, data: str) -> None:
        self.result.append(data)

    def get_text(self) -> str:
        return "".join(self.result)


def clean_text(content: str | None) -> str | None:
    """ref scraping_utils.py:118-130: strip tags, unescape entities,
    collapse whitespace."""
    if not isinstance(content, str):
        return content
    remover = _HTMLTagRemover()
    remover.feed(content + "\n")
    return " ".join(unescape(remover.get_text()).split()).strip()


def _by_parent(categories: list[dict], parent_uid: int, with_uid: bool = False):
    """ref _extract_specific_metadata (uved.py:58-70)."""
    out = []
    for cat in categories:
        parent = cat.get("parent")
        if parent and parent.get("uid") == parent_uid:
            title = (cat.get("title") or "").lower()
            out.append((title, cat.get("uid")) if with_uid else title)
    return out


def _licence(categories: list[dict]) -> str:
    """ref _extract_licence (uved.py:152-173) + format_cc_license
    (scraping_utils.py:59-74)."""
    flags = {"by"}
    for cat in categories:
        code = _LICENSE_UID_CC.get(cat.get("uid"))
        if code:
            flags.add(code)
    if "nd" in flags and "sa" in flags:
        flags.remove("sa")
    raw = "CC-" + "-".join(sorted(flags)) + "-4.0"
    parts = raw.split("-")
    version = parts[-1].strip()
    rights = "-".join(parts[1:-1]).strip().lower()
    return f"https://creativecommons.org/licenses/{rights}/{version}/"


def _sdg_ids(categories: list[dict]) -> list[int]:
    """ref _extract_external_sdg_ids (uved.py:245-262)."""
    ret: list[int] = []
    for ext_id in _by_parent(categories, 90):
        if ext_id == "les 17 odd":
            return list(range(1, 18))
        try:
            ret.append(int(ext_id.split(". ")[0]))
        except ValueError:
            pass
        ret.sort()
    return ret


def extract_uved_item(payload: str, url: str | None) -> dict[str, Any]:
    """One UVED member-API JSON → extracted fields
    (ref run + _extract_metadata)."""
    import datetime as dt

    item = json.loads(payload)
    if not item.get("description"):
        raise ValueError("NoDescriptionFound: No description found")

    cats = item.get("categories") or []
    states = _by_parent(cats, 70)
    state = states[0] if states else ""
    if state != "labellisé":
        raise ValueError(f"UnauthorizedState: State '{state}' is not authorized.")

    description = clean_text(item["description"])
    transcription = item.get("transcription")
    if transcription and len(transcription) > 1:
        full_content = clean_text(transcription)
    else:
        # transcriptionFile PDF fetch is a separate stage (no network
        # here) — reference falls back to the description likewise
        full_content = description

    # ref: naive strptime on the pre-'.' prefix, UTC pinned here
    # (the fixture dates carry an explicit +00:00 offset)
    pub_ts = (
        dt.datetime.strptime((item.get("date") or "").split(".")[0].split("+")[0], "%Y-%m-%dT%H:%M:%S")
        .replace(tzinfo=dt.timezone.utc)
        .timestamp()
    )

    levels = [
        {
            "isced_level": _LEVEL_ISCED.get(lv, 0),
            "original_scholar_level_name": lv,
            "original_country": "france",
        }
        for lv in _by_parent(cats, 14)
    ]
    fields = [
        {
            "isced_field": int(_FIELD_ISCED.get(f, "9999")),
            "original_scholar_field_name": f,
            "original_country": "france",
        }
        for f in _by_parent(cats, 115)
    ]
    topics = [
        {
            "name": topic,
            "depth": 0,
            "external_depth_name": name,
            "directly_contained_in": [],
            "external_id": str(uid),
        }
        for name, parent_uid in [("Domaines", 31), ("Thèmes", 20)]
        for topic, uid in _by_parent(cats, parent_uid, with_uid=True)
    ]
    institution_types = [
        {
            "taxonomy_name": _INSTITUTION_TYPES[n][0],
            "isced_level_awarded": _INSTITUTION_TYPES[n][1],
            "original_institution_type_name": n,
            "original_country": "france",
        }
        for n in _by_parent(cats, 209)
        if n in _INSTITUTION_TYPES
    ]

    details = {
        "tags": [(kw.get("title") or "").lower() for kw in item.get("keywords") or []],
        "main_institution": (item.get("mainInstitution") or {}).get("name"),
        "resource_link": item.get("url"),
        "publication_date": pub_ts,
        "recognition": _by_parent(cats, 152),
        "learning_modalities": _by_parent(cats, 214),
        "target_audiences": _by_parent(cats, 198),
        "used_sources": _by_parent(cats, 218),
        "initiative_types": _by_parent(cats, 146),
        "types": _by_parent(cats, 1),
        "formation_type": _by_parent(cats, 204),
        "institution_statut_for_provider": _by_parent(cats, 74),
        "licence": _licence(cats),
        "state": state,
        "topics": topics,
        "levels": levels,
        "external_sdg_ids": _sdg_ids(cats),
        "activities_types": [
            _ACTIVITY_TYPES.get(a, a) for a in _by_parent(cats, 10)
        ],
        "scholar_institution_types": institution_types,
        "fields_of_education": fields,
        "authors": [
            {
                "name": f"{c.get('firstName')} {c.get('lastName')}",
                "misc": "",
            }
            for c in item.get("contributor") or []
        ],
    }
    return {
        "url": url,
        "title": item.get("title"),
        "description": description,
        "full_content": full_content,
        "details_json": json.dumps(details, ensure_ascii=False),
        "external_id": str(item.get("uid")),
        "error_info": None,
    }


UVED_OUT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("full_content", T.StringType()),
        T.StructField("details_json", T.StringType()),
        T.StructField("external_id", T.StringType()),
        T.StructField("error_info", T.StringType()),
    ]
)


def extract_uved(
    df: DataFrame, payload_col: str = "payload", url_col: str = "url"
) -> DataFrame:
    """UVED member-API payloads → extracted WeLearn rows."""
    from ..session import ensure_self_on_executors

    ensure_self_on_executors(df.sparkSession)
    has_url = url_col in df.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                url = r[url_col] if has_url else None
                try:
                    rows.append(extract_uved_item(r[payload_col], url))
                except Exception as e:  # noqa: BLE001 — dead-letter (R6)
                    rows.append(
                        {
                            "url": url,
                            "title": None,
                            "description": None,
                            "full_content": None,
                            "details_json": None,
                            "external_id": None,
                            "error_info": f"{type(e).__name__}: {e}",
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in UVED_OUT_SCHEMA.fields])

    return df.mapInPandas(run, schema=UVED_OUT_SCHEMA)
