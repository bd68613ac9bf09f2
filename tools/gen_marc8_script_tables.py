"""Generate traject_spark/marc/marc8_scripts_data.py from glibc charmaps.

The MARC-8 non-Latin single-byte sets are the ISO-registered
bibliographic character sets the LoC "MARC 21 Specifications for Record
Structure, Character Sets" references:

  Basic Cyrillic    final 'N' (0x4E)  = ISO 5427:1984  (ISO-IR 37)
  Extended Cyrillic final 'Q' (0x51)  = ISO 5427 ext.  (ISO-IR 54)
  Basic Greek       final 'S' (0x53)  = ISO 5428:1984  (ISO-IR 55)
  Basic Arabic      final '3' (0x33)  = ASMO 449       (ISO-IR 89)

glibc ships the registrations as charmaps (/usr/share/i18n/charmaps);
this tool transcribes the printable range 0x21-0x7E of each into a
Python data module, with the glibc character names kept as comments so
every assignment is auditable against the registration sheets.

ISO 5428 encodes its seven Greek accents as NON-SPACING characters
(they precede the letter, like ANSEL diacritics); glibc maps them to
private-use placeholders because the charmap format predates combining
codepoints. We resolve them to the Unicode combining marks the glibc
names describe (the perispomeni choice is documented inline).

Run from the repo root:  python tools/gen_marc8_script_tables.py
"""

from __future__ import annotations

import gzip
import re
import os

CHARMAP_DIR = "/usr/share/i18n/charmaps"
OUT = os.path.join(
    os.path.dirname(__file__), "..", "traject_spark", "marc",
    "marc8_scripts_data.py",
)

#: ISO 5428's non-spacing accents arrive as glibc private-use
#: placeholders; resolve per the glibc charmap names (which cite the
#: ISO-IR 55 registration positions):
#:   0x21 NON-SPACING GRAVE ACCENT        -> U+0300
#:   0x22 NON-SPACING ACUTE ACCENT        -> U+0301
#:   0x23 NON-SPACING DIAERESIS           -> U+0308
#:   0x24 NON-SPACING TILDE               -> U+0342 (see below)
#:   0x25 GREEK NON-SPACING PSILI PNEUMATA -> U+0313
#:   0x26 GREEK NON-SPACING DASIA PNEUMATA -> U+0314
#:   0x27 GREEK NON-SPACING IOTA BELOW    -> U+0345
#: The 0x24 "tilde" is ISO 5428's circumflex accent; over Greek
#: letters that is the PERISPOMENI (U+0342, which NFC composes into
#: the polytonic block, e.g. omega+0342 -> U+1FF6), not the generic
#: U+0303 (which composes with no Greek letter).
GREEK_ACCENTS = {
    0x21: 0x0300, 0x22: 0x0301, 0x23: 0x0308, 0x24: 0x0342,
    0x25: 0x0313, 0x26: 0x0314, 0x27: 0x0345,
}

LINE = re.compile(r"^<U([0-9A-F]{4,6})>\s+/x([0-9a-f]{2})\s+(.*)$")


def parse(charmap: str) -> dict[int, tuple[int, str]]:
    """byte -> (codepoint, glibc name) for the printable 0x21-0x7E."""
    table: dict[int, tuple[int, str]] = {}
    with gzip.open(os.path.join(CHARMAP_DIR, charmap), "rt") as fh:
        for line in fh:
            m = LINE.match(line.strip())
            if not m:
                continue
            cp, byte, name = int(m.group(1), 16), int(m.group(2), 16), m.group(3)
            if 0x21 <= byte <= 0x7E:
                table[byte] = (cp, name)
    return table


def render(name: str, table: dict[int, tuple[int, str]], doc: str) -> str:
    lines = [f"#: {doc}", f"{name} = {{"]
    for byte in sorted(table):
        cp, gname = table[byte]
        lines.append(f"    0x{byte:02X}: 0x{cp:04X},  # {gname}")
    lines.append("}")
    return "\n".join(lines)


def main() -> None:
    cyr = {b: v for b, v in parse("ISO_5427.gz").items()}
    ext = {b: v for b, v in parse("ISO_5427-EXT.gz").items()}
    ara = {b: v for b, v in parse("ASMO_449.gz").items()}
    gre = {}
    for b, (cp, gname) in parse("ISO_5428.gz").items():
        if 0xE000 <= cp <= 0xF8FF:  # private-use placeholder -> accent
            cp = GREEK_ACCENTS[b]
            gname += f" [resolved to U+{cp:04X}]"
        gre[b] = (cp, gname)

    body = "\n\n".join([
        render(
            "BASIC_CYRILLIC", cyr,
            "MARC-8 Basic Cyrillic (final 'N') = ISO 5427 / ISO-IR 37",
        ),
        render(
            "EXTENDED_CYRILLIC", ext,
            "MARC-8 Extended Cyrillic (final 'Q') = ISO 5427 ext / ISO-IR 54",
        ),
        render(
            "BASIC_GREEK", gre,
            "MARC-8 Basic Greek (final 'S') = ISO 5428 / ISO-IR 55",
        ),
        render(
            "BASIC_ARABIC", ara,
            "MARC-8 Basic Arabic (final '3') = ASMO 449 / ISO-IR 89",
        ),
    ])
    accents = ", ".join(f"0x{b:02X}" for b in sorted(GREEK_ACCENTS))
    header = (
        '"""MARC-8 non-Latin single-byte code tables (GENERATED — do not\n'
        "edit; regenerate with tools/gen_marc8_script_tables.py).\n\n"
        "Byte -> Unicode codepoint for the printable range of each set,\n"
        "transcribed from the ISO registrations the LoC MARC-8 spec cites\n"
        "(via glibc's charmaps; glibc character names kept as comments).\n"
        "ISO 5428's seven accents (bytes 0x21-0x27) are NON-SPACING: they\n"
        'precede their letter in the byte stream, like ANSEL diacritics.\n"""\n\n'
        f"#: Basic Greek bytes that are combining accents\n"
        f"GREEK_COMBINING_BYTES = frozenset([{accents}])\n\n"
    )
    with open(OUT, "w") as fh:
        fh.write(header + body + "\n")
    print(f"wrote {os.path.normpath(OUT)}")


if __name__ == "__main__":
    main()
