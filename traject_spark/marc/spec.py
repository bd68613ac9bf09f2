"""Plan-time parser for MARC extraction spec strings.

Grammar (reference: lib/traject/marc_extractor_spec.rb:165-166):

- datafield spec:    TAG [ '|' ind1 ind2 '|' ] [subfield codes]
                     e.g. ``245``, ``245abc``, ``245|01|ab``, ``020aa``
- controlfield spec: TAG '[' byte [ '-' byte ] ']'
                     e.g. ``008[35-37]``, ``007[5]``
- multiple specs joined with ':' (whitespace around ':' tolerated);
  the same tag may appear more than once (``245a:245abc``).

Indicator ``*`` (or omitted pair) is a wildcard; a literal space matches a
blank indicator (lib/traject/marc_extractor_spec.rb:95-102,125-128).

Parsing happens ONCE at pipeline-definition time — the compiled
``MarcSpec`` list parameterizes Column expressions, so there is zero
per-record interpretation cost (mirrors the reference's compile-once
guidance, lib/traject/marc_extractor.rb:85-108).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Optional, Sequence, Union

DATAFIELD_PATTERN = re.compile(
    r"\A([a-zA-Z0-9]{3})(\|([a-z0-9 *])([a-z0-9 *])\|)?([a-z0-9]*)?\Z"
)
CONTROLFIELD_PATTERN = re.compile(r"\A([a-zA-Z0-9]{3})(\[(\d+)(-(\d+))?\])\Z")

ALTERNATE_SCRIPT_TAG = "880"


@dataclass(frozen=True)
class MarcSpec:
    """One compiled extraction spec for one tag.

    ``bytes_start``/``bytes_end`` set => controlfield byte-slice spec.
    ``subfields`` None => all subfields; indicators None => wildcard.
    """

    tag: str
    ind1: Optional[str] = None
    ind2: Optional[str] = None
    subfields: Optional[tuple] = None
    bytes_start: Optional[int] = None
    bytes_end: Optional[int] = None

    @property
    def is_byte_spec(self) -> bool:
        return self.bytes_start is not None

    @property
    def joinable(self) -> bool:
        # '630' (no subfields) or '630abc' join; '633a' stays one value per
        # subfield occurrence; doubled code '020aa' joins again
        # (lib/traject/marc_extractor_spec.rb:85-94).
        return self.subfields is None or len(self.subfields) != 1

    @property
    def byte_length(self) -> int:
        if self.bytes_end is not None:
            return self.bytes_end - self.bytes_start + 1
        return 1


def parse_marc_spec(spec: Union[str, Sequence[str]]) -> list[MarcSpec]:
    """Parse a spec string (or list of them) into an ordered MarcSpec list.

    Order is significant: a record field matches the specs for its tag in
    declaration order (lib/traject/marc_extractor_spec.rb:153-177).
    """
    if isinstance(spec, str):
        parts = re.split(r"\s*:\s*", spec)
    else:
        parts = []
        for s in spec:
            parts.extend(re.split(r"\s*:\s*", s))
    # Ruby's String#split drops TRAILING empty strings, so the
    # reference accepts "245ab:" (and "" is a no-op extractor) —
    # re.split keeps them and a previously-valid config would raise
    # here at definition time. Leading/interior empties (":245",
    # "245::100") stay and raise, as they do in the reference.
    while parts and parts[-1] == "":
        parts.pop()

    out: list[MarcSpec] = []
    for part in parts:
        m = DATAFIELD_PATTERN.match(part)
        if m:
            tag, i1, i2, subs = m.group(1), m.group(3), m.group(4), m.group(5)
            out.append(
                MarcSpec(
                    tag=tag,
                    ind1=None if i1 in (None, "*") else i1,
                    ind2=None if i2 in (None, "*") else i2,
                    subfields=tuple(subs) if subs else None,
                )
            )
            continue
        m = CONTROLFIELD_PATTERN.match(part)
        if m:
            tag, b1, b2 = m.group(1), m.group(3), m.group(5)
            out.append(
                MarcSpec(
                    tag=tag,
                    bytes_start=int(b1),
                    bytes_end=int(b2) if b2 is not None else None,
                )
            )
            continue
        raise ValueError(f"Unrecognized marc extract specification: {part!r}")
    return out
