"""Built-in translation-map data, authored from public Library of Congress
code lists (MARC language codes, geographic area codes, 048 instrument
codes, LCC top-level classes, leader/007 genre bytes).

The reference ships these as YAML under lib/translation_maps/ — the
semantics (lookup/default/merge) live in traject_spark.translation_map;
this module only carries data.  The language, geographic, and
instrument lists are the complete public LoC code lists (same data the
reference bundles); the ~8k-entry language map compiles to TranslationMap's
sharded ``str_to_map`` literal path (pure Column expressions, JVM-side),
the small maps to literal ``create_map`` expressions — the pandas-UDF
fallback only engages for maps whose data collides with the encoding
separators, never these.
"""

# LCC first letter -> broad category (reference: lcc_top_level.yaml;
# factual LCC outline, W = NLM medicine)
LCC_TOP_LEVEL = {
    "A": "General Works",
    "B": "Philosophy, Psychology, Religion",
    "C": "Historical Sciences (Archaeology, Genealogy)",
    "D": "World History",
    "E": "History of the Americas (General)",
    "F": "History of the Americas (Local)",
    "G": "Geography, Anthropology, Recreation",
    "H": "Social Sciences",
    "J": "Political Science",
    "K": "Law",
    "L": "Education",
    "M": "Music",
    "N": "Fine Arts",
    "P": "Language & Literature",
    "Q": "Science",
    "R": "Medicine",
    "S": "Agriculture",
    "T": "Technology",
    "U": "Military Science",
    "V": "Naval Science",
    "W": "Medicine",
    "Z": "Bibliography, Library Science, Information Resources",
}

# leader bytes 6+7 (two-char keys) then leader byte 6 (one-char keys)
# -> format vocabulary (reference: marc_genre_leader.yaml)
MARC_GENRE_LEADER = {
    "aa": "Book",
    "ab": "Journal/Newspaper",
    "am": "Book",
    "as": "Journal/Newspaper",
    "ta": "Book",
    "tm": "Book",
    "c": "Musical Score",
    "d": "Musical Score",
    "e": "Map/Globe",
    "f": "Map/Globe",
    "i": "Non-musical Recording",
    "j": "Musical Recording",
    "k": "Image",
    "m": "Software/Data",
    "g": "Video/Film",
}

# 007 byte 0 -> format vocabulary (reference: marc_genre_007.yaml)
MARC_GENRE_007 = {
    "a": "Map/Globe",
    "d": "Map/Globe",
    "k": "Image",
    "q": "Musical Score",
    "r": "Image",
    "v": "Video/Film",
    "m": "Video/Film",
}

# 048 instrument/voice codes -> display label (full public LoC 048 list;
# reference bundles the same list as marc_instruments.yaml)
from traject_spark.translation_maps.marc_instruments_data import (  # noqa: E402
    MARC_INSTRUMENTS_FULL as MARC_INSTRUMENTS,
)

# MARC geographic area codes -> place name (full public LoC GAC list,
# incl. discontinued codes; reference: marc_geographic.yaml)
from traject_spark.translation_maps.marc_geographic_data import (  # noqa: E402
    MARC_GEOGRAPHIC_FULL as MARC_GEOGRAPHIC,
)

# MARC language codes -> display name (full public LoC language code
# list, incl. obsolete + ISO 639-3 codes; reference: marc_languages.yaml).
# ~8k entries: compiles to the sharded str_to_map literal path.
from traject_spark.translation_maps.marc_languages_data import (  # noqa: E402
    MARC_LANGUAGES_FULL as MARC_LANGUAGES,
)

BUILTIN_MAPS = {
    "lcc_top_level": LCC_TOP_LEVEL,
    "marc_genre_leader": MARC_GENRE_LEADER,
    "marc_genre_007": MARC_GENRE_007,
    "marc_instruments": MARC_INSTRUMENTS,
    "marc_geographic": MARC_GEOGRAPHIC,
    "marc_languages": MARC_LANGUAGES,
}
