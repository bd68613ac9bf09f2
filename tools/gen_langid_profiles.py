"""Generate character-trigram language-ID profiles.

Writes ``traject_spark/corpus/langid_data.py``: for each language, the
most frequent trigrams that are UNIQUE to it within the sample corpus
(Cavnar & Trenkle '94 style profiles, reduced to a set-membership form
the engine can evaluate as a pure Column expression — see
``textstats.langid_ngram_expr``).

Sample texts: Article 1 of the Universal Declaration of Human Rights
(public domain, UN), the standard smallest-common multilingual corpus.
One sentence per language keeps the profiles thin but deterministic and
fully offline; a deployment with a real corpus reruns this generator
with bigger text and everything downstream (Spark expr + DuckDB twin,
both rendered from the same table) follows.

Run: ``python tools/gen_langid_profiles.py`` (idempotent; output is
sorted so the file is diff-stable).
"""

from __future__ import annotations

import re
from collections import Counter

#: UDHR Article 1 (public domain). Keys are ISO 639-1 codes.
SAMPLES: dict[str, str] = {
    "ar": "يولد جميع الناس أحرارا متساوين في الكرامة والحقوق. وقد وهبوا "
          "عقلا وضميرا وعليهم أن يعامل بعضهم بعضا بروح الإخاء.",
    "cs": "Všichni lidé rodí se svobodní a sobě rovní co do důstojnosti "
          "a práv. Jsou nadáni rozumem a svědomím a mají spolu jednat "
          "v duchu bratrství.",
    "da": "Alle mennesker er født frie og lige i værdighed og "
          "rettigheder. De er udstyret med fornuft og samvittighed, og "
          "de bør handle mod hverandre i en broderskabets ånd.",
    "de": "Alle Menschen sind frei und gleich an Würde und Rechten "
          "geboren. Sie sind mit Vernunft und Gewissen begabt und "
          "sollen einander im Geist der Brüderlichkeit begegnen.",
    "el": "Όλοι οι άνθρωποι γεννιούνται ελεύθεροι και ίσοι στην "
          "αξιοπρέπεια και τα δικαιώματα. Είναι προικισμένοι με λογική "
          "και συνείδηση, και οφείλουν να συμπεριφέρονται μεταξύ τους "
          "με πνεύμα αδελφοσύνης.",
    "en": "All human beings are born free and equal in dignity and "
          "rights. They are endowed with reason and conscience and "
          "should act towards one another in a spirit of brotherhood.",
    "es": "Todos los seres humanos nacen libres e iguales en dignidad y "
          "derechos y, dotados como están de razón y conciencia, deben "
          "comportarse fraternalmente los unos con los otros.",
    "fi": "Kaikki ihmiset syntyvät vapaina ja tasavertaisina arvoltaan "
          "ja oikeuksiltaan. Heille on annettu järki ja omatunto, ja "
          "heidän on toimittava toisiaan kohtaan veljeyden hengessä.",
    "fr": "Tous les êtres humains naissent libres et égaux en dignité "
          "et en droits. Ils sont doués de raison et de conscience et "
          "doivent agir les uns envers les autres dans un esprit de "
          "fraternité.",
    "he": "כל בני האדם נולדו בני חורין ושווים בערכם ובזכויותיהם. כולם "
          "חוננו בתבונה ובמצפון, לפיכך חובה עליהם לנהוג איש ברעהו ברוח "
          "של אחווה.",
    "hi": "सभी मनुष्यों को गौरव और अधिकारों के मामले में जन्मजात "
          "स्वतन्त्रता और समानता प्राप्त है। उन्हें बुद्धि और "
          "अन्तरात्मा की देन प्राप्त है और परस्पर उन्हें भाईचारे के "
          "भाव से बर्ताव करना चाहिए।",
    "hu": "Minden emberi lény szabadon születik és egyenlő méltósága és "
          "joga van. Az emberek, ésszel és lelkiismerettel bírván, "
          "egymással szemben testvéri szellemben kell hogy "
          "viseltessenek.",
    "id": "Semua orang dilahirkan merdeka dan mempunyai martabat dan "
          "hak-hak yang sama. Mereka dikaruniai akal dan hati nurani "
          "dan hendaknya bergaul satu sama lain dalam semangat "
          "persaudaraan.",
    "it": "Tutti gli esseri umani nascono liberi ed eguali in dignità e "
          "diritti. Essi sono dotati di ragione e di coscienza e devono "
          "agire gli uni verso gli altri in spirito di fratellanza.",
    "ja": "すべての人間は、生まれながらにして自由であり、かつ、尊厳と"
          "権利とについて平等である。人間は、理性と良心とを授けられて"
          "おり、互いに同胞の精神をもって行動しなければならない。",
    "ko": "모든 인간은 태어날 때부터 자유로우며 그 존엄과 권리에 있어 "
          "동등하다. 인간은 천부적으로 이성과 양심을 부여받았으며 서로 "
          "형제애의 정신으로 행동하여야 한다.",
    "nl": "Alle mensen worden vrij en gelijk in waardigheid en rechten "
          "geboren. Zij zijn begiftigd met verstand en geweten, en "
          "behoren zich jegens elkander in een geest van broederschap "
          "te gedragen.",
    "no": "Alle mennesker er født frie og med samme menneskeverd og "
          "menneskerettigheter. De er utstyrt med fornuft og "
          "samvittighet og bør handle mot hverandre i brorskapets ånd.",
    "pl": "Wszyscy ludzie rodzą się wolni i równi pod względem swej "
          "godności i swych praw. Są oni obdarzeni rozumem i sumieniem "
          "i powinni postępować wobec innych w duchu braterstwa.",
    "pt": "Todos os seres humanos nascem livres e iguais em dignidade e "
          "em direitos. Dotados de razão e de consciência, devem agir "
          "uns para com os outros em espírito de fraternidade.",
    "ro": "Toate ființele umane se nasc libere și egale în demnitate și "
          "în drepturi. Ele sunt înzestrate cu rațiune și conștiință și "
          "trebuie să se comporte unele față de altele în spiritul "
          "fraternității.",
    "ru": "Все люди рождаются свободными и равными в своем достоинстве "
          "и правах. Они наделены разумом и совестью и должны поступать "
          "в отношении друг друга в духе братства.",
    "sv": "Alla människor är födda fria och lika i värde och "
          "rättigheter. De har utrustats med förnuft och samvete och "
          "bör handla gentemot varandra i en anda av gemenskap.",
    "sw": "Watu wote wamezaliwa huru, hadhi na haki zao ni sawa. Wote "
          "wamejaliwa akili na dhamiri, hivyo yapasa watendeane "
          "kindugu.",
    "tr": "Bütün insanlar hür, haysiyet ve haklar bakımından eşit "
          "doğarlar. Akıl ve vicdana sahiptirler ve birbirlerine karşı "
          "kardeşlik zihniyeti ile hareket etmelidirler.",
    "uk": "Всі люди народжуються вільними і рівними у своїй гідності та "
          "правах. Вони наділені розумом і совістю і повинні діяти у "
          "відношенні один до одного в дусі братерства.",
    "vi": "Tất cả mọi người sinh ra đều được tự do và bình đẳng về nhân "
          "phẩm và quyền lợi. Mọi con người đều được tạo hóa ban cho lý "
          "trí và lương tâm và cần phải đối xử với nhau trong tình anh "
          "em.",
    "zh": "人人生而自由，在尊严和权利上一律平等。他们赋有理性和良心，"
          "并应以兄弟关系的精神相对待。",
}

PROFILE_SIZE = 40
MIN_PROFILE = 8


def normalize(text: str) -> str:
    """EXACTLY the engine's runtime normalization (lower + collapse
    ASCII whitespace + trim) — Java \\s is ASCII-only, so the generator
    collapses the same class, not Python's Unicode \\s."""
    return re.sub(r"[ \t\n\r\f\v]+", " ", text.lower()).strip()


def trigrams(text: str) -> Counter:
    return Counter(text[i : i + 3] for i in range(len(text) - 2))


def build_profiles(samples: dict[str, str] = SAMPLES,
                   k: int = PROFILE_SIZE) -> dict[str, list[str]]:
    counts = {lang: trigrams(normalize(t)) for lang, t in samples.items()}
    out: dict[str, list[str]] = {}
    for lang, cnt in counts.items():
        others = set()
        for lg, c in counts.items():
            if lg != lang:
                others.update(c)
        unique = [g for g in cnt if g not in others]
        # frequency-ranked, lexicographic tiebreak: deterministic output
        top = sorted(unique, key=lambda g: (-cnt[g], g))[:k]
        if len(top) < MIN_PROFILE:
            raise SystemExit(
                f"language {lang}: only {len(top)} unique trigrams — "
                "sample too thin or colliding with a sibling language"
            )
        out[lang] = sorted(top)  # set semantics downstream; sort for diffs
    return out


HEADER = '''"""Character-trigram language-ID profiles (GENERATED — do not edit).

Regenerate with ``python tools/gen_langid_profiles.py``. Source text:
UDHR Article 1 (public domain); profile = the most frequent trigrams
unique to each language within the sample corpus. Consumed by
``textstats.langid_ngram_expr`` (Spark Column expr) and the DuckDB
oracle twin — both rendered from this one table.
"""

LANGID_PROFILES = {
'''


def main() -> None:
    profiles = build_profiles()
    lines = [HEADER]
    for lang in sorted(profiles):
        grams = ", ".join(repr(g) for g in profiles[lang])
        lines.append(f"    {lang!r}: [{grams}],\n")
    lines.append("}\n")
    path = "traject_spark/corpus/langid_data.py"
    with open(path, "w", encoding="utf-8") as fh:
        fh.write("".join(lines))
    sizes = {lg: len(v) for lg, v in profiles.items()}
    print(f"wrote {path}: {len(profiles)} languages, "
          f"profile sizes {min(sizes.values())}-{max(sizes.values())}")


if __name__ == "__main__":
    main()
