"""Corpus-policy constants shared by the extraction plugins.

Values mirror the reference's ``constants.py`` (the license allow-list
at :169-185, publisher block-list at :235+, base URLs at :195-203) —
these are POLICY DATA, not logic; they must match exactly for
extraction parity.
"""

from __future__ import annotations

HTTP_CREATIVE_COMMONS = "http://creativecommons.org"
HTTPS_CREATIVE_COMMONS = "https://creativecommons.org"

# ref constants.py:169-185
AUTHORIZED_LICENSES = [
    f"{HTTP_CREATIVE_COMMONS}/licenses/by/3.0/",
    f"{HTTP_CREATIVE_COMMONS}/licenses/by/4.0/",
    f"{HTTP_CREATIVE_COMMONS}/licenses/by-sa/4.0/",
    f"{HTTP_CREATIVE_COMMONS}/licenses/by-sa/3.0/",
    f"{HTTP_CREATIVE_COMMONS}/licenses/by-sa/3.0/igo/",
    f"{HTTP_CREATIVE_COMMONS}/publicdomain/zero/1.0/",
    f"{HTTP_CREATIVE_COMMONS}/publicdomain/mark/1.0/",
    f"{HTTPS_CREATIVE_COMMONS}/licenses/by/3.0/",
    f"{HTTPS_CREATIVE_COMMONS}/licenses/by/4.0/",
    f"{HTTPS_CREATIVE_COMMONS}/publicdomain/zero/1.0/",
    f"{HTTPS_CREATIVE_COMMONS}/publicdomain/mark/1.0/",
    f"{HTTPS_CREATIVE_COMMONS}/licenses/by-sa/4.0/",
    f"{HTTPS_CREATIVE_COMMONS}/licenses/by-sa/3.0/",
    f"{HTTPS_CREATIVE_COMMONS}/licenses/by-sa/3.0/igo/",
    f"{HTTPS_CREATIVE_COMMONS}/licenses/by/3.0/igo/",
]

# version-insensitive prefixes, ref plugins/rest_requesters/hal.py:39-48
AUTHORIZED_LICENSES_WITHOUT_VERSION = sorted(
    {"/".join(lic.split("/")[:-2]) + "/" for lic in AUTHORIZED_LICENSES}
)
HAL_LOCAL_LICENSES = ["http://hal.archives-ouvertes.fr/licences/publicDomain/"]

HAL_URL_BASE = "https://hal.science/"  # ref constants.py:197
OPEN_ALEX_BASE_URL = "https://api.openalex.org/works"  # ref constants.py:199
YEAR_FIRST_DATE_FORMAT = "yyyy-MM-dd"  # ref constants.py:201 (%Y-%m-%d)

# OpenAlex host-organization ids of predatory publishers,
# ref constants.py:235-360 (deduplicated — the reference list holds
# repeats; membership semantics are unchanged)
PUBLISHERS_TO_AVOID = [
    "P4310310987", "P4310311589", "P4310311735", "P4310311864", "P4310312766", "P4310312881",
    "P4310313016", "P4310313755", "P4310314442", "P4310315241", "P4310315663", "P4310315735",
    "P4310315795", "P4310315810", "P4310315843", "P4310316567", "P4310316790", "P4310317086",
    "P4310317519", "P4310317790", "P4310318044", "P4310318299", "P4310318345", "P4310318591",
    "P4310318723", "P4310318992", "P4310319563", "P4310319724", "P4310319811", "P4310319815",
    "P4310319869", "P4310319908", "P4310319982", "P4310320063", "P4310320093", "P4310320259",
    "P4310320321", "P4310320334", "P4310320342", "P4310320424", "P4310320480", "P4310320527",
    "P4310320842", "P4310320994", "P4310321069", "P4310321074", "P4310321646", "P4310321726",
    "P4310322050", "P4320800656", "P4320800740", "P4322614448", "P4322632798", "P4322696804",
    "P4322697004", "P4322697801", "P4322699584", "P4322764864", "P4322764886", "P4323237698",
    "P4323237894", "P4323253347", "P4323283508", "P4323430444", "P4323432882", "P4323971528",
    "P4323972566", "P4324001558", "P4324004145", "P4324004152", "P4324113678", "P4324147902",
    "P4324262928", "P4324341404", "P4327874083", "P4327874097", "P4327876843", "P4327876862",
    "P4327986823", "P4328135221", "P4328141805", "P4353105723", "P4353107447", "P4353108569",
    "P4353108604", "P4360969180", "P4360969395", "P4360969447", "P4361063272", "P4361075571",
    "P4361121922", "P4362561667", "P4362643899", "P4362724842", "P4362724891", "P4362724893",
    "P4363603480", "P4364118893", "P4364309641", "P4365393707", "P4366111303", "P4366371026",
    "P4376634143", "P4383858765", "P4404533578", "P4404662409", "P4404668943", "P4404677186",
]

# ref plugins/rest_requesters/hal.py:28-37
HAL_EXPLICIT_TYPES = {
    "ART": "article",
    "COMM": "communication",
    "COUV": "chapter",
    "THESE": "thesis",
    "OUV": "book",
    "MEM": "dissertation",
    "REPORT": "report",
    "UNDEFINED": "preprint",
}

# ref plugins/rest_requesters/ted.py:23
TED_PROHIBITED_TEXT = ["(Music)", "(Applause)", "(Laughter)"]

# ref plugins/rest_requesters/wikipedia.py:16-46
WIKIPEDIA_SECTIONS_BLACKLIST = {
    "fr": [
        "Notes et r\u00e9f\u00e9rences",
        "Liens externes",
        "Voir aussi",
        "R\u00e9f\u00e9rences",
        "Bibliographie",
        "Annexes",
        "Distribution",
        "Articles connexes",
        "Fiche technique",
        "Sources",
        "Lien externe",
        "Notes",
        "Source",
        "Article connexe",
    ],
    "en": [
        "References",
        "Other websites",
        "Related pages",
        "Notes",
        "Further reading",
        "Bibliography",
        "Sources",
        "More reading",
        "External links",
        "See also",
        "Articles",
    ],
}

# ref regular_expression.py:12
ANTI_URL_REGEX = (
    r"\(?((www)|((https?|ftp|file):\/\/))"
    r"[-A-Za-z0-9+&@#/%?=~_|!:,.;]*[-A-Za-z0-9+&@#/%=~_|]\)?"
)
