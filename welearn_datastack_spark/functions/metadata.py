"""Computed document metadata — readability & reading-duration
(reference modules/computed_metadata.py), as pure column expressions.

Constants mirror the reference's FLESCH_KINCAID_CONSTANTS and
DICT_READING_SPEEDS_LANG (constants.py:117–161). Both functions return
**strings**, faithfully preserving the reference's quirk of stringly
typed metadata destined for the ``details`` JSON blob
(computed_metadata.py:156–198).
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column
from pyspark.sql import functions as F

from .text import lexicon_count, sentence_count, syllable_count_approx, word_count_simple

# reference constants.py:130–161 — per-language Flesch constants
# (base, sentence-length weight, syllables-per-word weight)
FLESCH_CONSTANTS: dict[str, tuple[float, float, float]] = {
    "en": (206.835, 1.015, 84.6),
    "fr": (207.0, 1.015, 73.6),
    "es": (206.84, 1.02, 60.0),
    "de": (180.0, 1.0, 58.5),
    "it": (217.0, 1.3, 60.0),
    "nl": (206.84, 0.93, 77.0),
}

# reference constants.py:117–128 — words-per-minute by language
READING_SPEEDS: dict[str, int] = {
    "en": 228,
    "fr": 195,
    "es": 218,
    "de": 179,
    "it": 188,
    "nl": 202,
}
DEFAULT_READING_SPEED = 184  # computed_metadata.py:195 default


def _lang_map(d: dict) -> Column:
    return F.create_map(*list(chain.from_iterable((F.lit(k), F.lit(v)) for k, v in d.items())))


def round_half_away(col: Column, digits: int = 2) -> Column:
    """The reference's explicit round-half-away-from-zero:
    ``floor(x*100 + copysign(0.5, x)) / 100``
    (computed_metadata.py:166–172)."""
    scale = 10**digits
    return F.floor(col * scale + F.when(col < 0, F.lit(-0.5)).otherwise(F.lit(0.5))) / scale


def predict_readability(text: Column, lang: Column) -> Column:
    """Per-language Flesch readability, clamped to [0, 100], rounded
    half-away to 2 digits, returned AS STRING; NULL when the language
    is unsupported (reference F13, computed_metadata.py:156–180).

    Uses the vowel-group syllable approximation (see
    text.syllable_count_approx) so the whole expression stays
    JVM-side and has an exact ANSI-SQL oracle twin.
    """
    words = lexicon_count(text).cast("double")
    sentences = sentence_count(text).cast("double")
    syllables = syllable_count_approx(text).cast("double")
    asl = words / sentences
    asw = syllables / F.greatest(words, F.lit(1.0))
    base = _lang_map({k: v[0] for k, v in FLESCH_CONSTANTS.items()})[lang]
    w_sl = _lang_map({k: v[1] for k, v in FLESCH_CONSTANTS.items()})[lang]
    w_sw = _lang_map({k: v[2] for k, v in FLESCH_CONSTANTS.items()})[lang]
    score = base - w_sl * asl - w_sw * asw
    clamped = F.least(F.greatest(round_half_away(score), F.lit(0.0)), F.lit(100.0))
    # decimal cast gives stable 2-dp string formatting across engines
    return F.when(base.isNotNull(), clamped.cast("decimal(6,2)").cast("string"))


def predict_duration(text: Column, lang: Column) -> Column:
    """Reading duration in seconds: ``int(words / speed * 60)``, speed
    looked up per language with default 184, returned AS STRING
    (reference F14, computed_metadata.py:183–198)."""
    words = word_count_simple(text).cast("double")
    speed = F.coalesce(_lang_map(READING_SPEEDS)[lang], F.lit(DEFAULT_READING_SPEED)).cast("double")
    return (words / speed * 60).cast("int").cast("string")
