"""Text-analysis operator tests (round 13, VERDICT r12 #4): Gopher
quality components and character-trigram language ID.

The oracle rows (`text_gopher_quality`, `text_langid_ngram`) pin
Spark-vs-DuckDB parity on the synthetic corpus; these tests pin the
SEMANTICS on crafted and real multilingual text the synthetic corpus
cannot exercise."""

import pytest
from pyspark.sql import functions as F

from traject_spark.corpus.textstats import (
    alpha_word_ratio_expr,
    bullet_line_fraction_expr,
    char_ngrams_expr,
    ellipsis_line_fraction_expr,
    gopher_quality_expr,
    gopher_stopword_hits_expr,
    langid_ngram_expr,
    max_token_ratio_expr,
    mean_word_length_expr,
    symbol_word_ratio_expr,
)


def _one(spark, text, expr):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(expr(F.col("text")).alias("v")).collect()[0]["v"]


def test_mean_word_length_ignores_empty_tokens(spark):
    # 'ab  cd' double space: split yields ['ab','','cd'] — the empty
    # token must not drag the mean down
    assert _one(spark, "ab  cd", mean_word_length_expr) == 2.0
    assert _one(spark, "a bb ccc", mean_word_length_expr) == 2.0
    assert _one(spark, "", mean_word_length_expr) == 0.0
    assert _one(spark, None, mean_word_length_expr) is None


def test_symbol_word_ratio_counts_hashes_and_ellipses(spark):
    # 2 hashes + 1 three-dot ellipsis + 1 unicode ellipsis over 4 words
    assert _one(spark, "a# b# c... d…", symbol_word_ratio_expr) == 1.0
    assert _one(spark, "clean text here", symbol_word_ratio_expr) == 0.0
    # '....' = one '...' replace (leftmost, non-overlapping) + 1 residue
    assert _one(spark, "x....", symbol_word_ratio_expr) == 1.0


def test_alpha_word_ratio_any_script(spark):
    # digits-only and punctuation-only words fail; Cyrillic/Han pass
    assert _one(spark, "abc 123 мир 漢字 !!", alpha_word_ratio_expr) == 0.6


def test_line_fractions(spark):
    text = "• first\n- second\nplain\ntrails off...\nends…"
    assert _one(spark, text, bullet_line_fraction_expr) == 0.4
    assert _one(spark, text, ellipsis_line_fraction_expr) == 0.4
    assert _one(spark, "no lines here", bullet_line_fraction_expr) == 0.0


def test_max_token_ratio_matches_brute_force(spark):
    # sorted-run implementation vs a Python Counter on random docs
    import random
    from collections import Counter

    rng = random.Random(13)
    vocab = ["a", "bb", "ccc", "dd", "e"]
    rows = [
        (" ".join(rng.choices(vocab, k=rng.randint(1, 40))),)
        for _ in range(50)
    ] + [("solo",), ("x x x x",)]
    df = spark.createDataFrame(rows, "text string")
    got = df.select(
        "text", max_token_ratio_expr(F.col("text")).alias("r")
    ).collect()
    for row in got:
        from decimal import ROUND_HALF_UP, Decimal

        toks = [t for t in row["text"].split(" ") if t]
        # Spark round() is HALF_UP; Python round() is banker's
        expect = float(
            Decimal(max(Counter(toks).values()) / len(toks)).quantize(
                Decimal("0.0001"), rounding=ROUND_HALF_UP
            )
        )
        assert row["r"] == pytest.approx(expect), row["text"]


def test_gopher_stopword_hits_distinct(spark):
    assert _one(spark, "the the the", gopher_stopword_hits_expr) == 1
    assert _one(spark, "the cat and the dog", gopher_stopword_hits_expr) == 2


def test_gopher_passes_on_real_prose_fails_on_junk(spark):
    prose = (
        "The committee said that the new policy would be approved with "
        "broad support and that members of the board were expected to "
        "vote on it next week. " * 3
    )
    junk_symbols = " ".join(["#tag…"] * 80)
    junk_short = "too short to pass"
    df = spark.createDataFrame(
        [(prose,), (junk_symbols,), (junk_short,)], "text string"
    )
    got = [
        r["g"]["passes"]
        for r in df.select(
            gopher_quality_expr(F.col("text")).alias("g")
        ).collect()
    ]
    assert got == [True, False, False]


def test_char_ngrams_edges(spark):
    assert _one(spark, "abcd", char_ngrams_expr) == ["abc", "bcd"]
    # normalization: lower + whitespace collapse happens first
    assert _one(spark, "A  B", char_ngrams_expr) == ["a b"]
    # below n chars: EMPTY, never a descending-sequence artifact
    assert _one(spark, "ab", char_ngrams_expr) == []
    assert _one(spark, "", char_ngrams_expr) == []


def test_langid_ngram_self_consistent_on_all_profiles(spark):
    """Every generator sample classifies as its own language — the
    profiles are mutually discriminating by construction (unique
    trigrams), so this pins both the data and the argmax."""
    import sys

    sys.path.insert(0, "/root/repo")
    from tools.gen_langid_profiles import SAMPLES

    df = spark.createDataFrame(
        list(SAMPLES.items()), "lang string, text string"
    )
    got = df.select(
        "lang", langid_ngram_expr(F.col("text")).alias("guess")
    ).collect()
    assert len(got) >= 20  # the brief's ≥20-language bar
    for r in got:
        assert r["guess"] == r["lang"], (r["lang"], r["guess"])


def test_langid_ngram_held_out_sentences(spark):
    """Held-out sentences (not in the profile corpus) still classify
    for the bigger Latin/Cyrillic languages. CJK held-out text needs
    larger profile corpora (documented in the generator); not asserted
    here."""
    cases = [
        ("en", "The committee said that the new policy would have been "
               "approved with broad support from all the members."),
        ("de", "Alle Bürger sind vor dem Gesetz gleich und haben das "
               "Recht auf freie Entfaltung ihrer Persönlichkeit, solange "
               "sie die Rechte anderer nicht verletzen."),
        ("fr", "Le gouvernement a annoncé que les nouvelles mesures "
               "seraient mises en place dès la semaine prochaine dans "
               "toutes les régions du pays."),
        ("es", "Los investigadores descubrieron que el cerebro humano "
               "puede procesar muchas tareas al mismo tiempo con razón "
               "y conciencia."),
        ("it", "I ricercatori hanno scoperto che il cervello umano può "
               "elaborare molte attività contemporaneamente con ragione "
               "e coscienza."),
        ("pl", "Naukowcy odkryli, że ludzki mózg może przetwarzać wiele "
               "zadań jednocześnie i powinni działać w duchu "
               "współpracy."),
        ("tr", "Bilim insanları, insan beyninin aynı anda birçok görevi "
               "akıl ve vicdan ile işleyebildiğini keşfettiler."),
        ("el", "Οι επιστήμονες ανακάλυψαν ότι ο ανθρώπινος εγκέφαλος "
               "μπορεί να επεξεργάζεται πολλές εργασίες ταυτόχρονα με "
               "λογική και συνείδηση."),
        ("ru", "Правительство объявило, что новые меры будут введены на "
               "следующей неделе во всех регионах страны."),
        ("uk", "Науковці виявили, що людський мозок може обробляти "
               "багато завдань одночасно і повинні діяти в дусі "
               "співпраці."),
    ]
    df = spark.createDataFrame(cases, "lang string, text string")
    got = df.select(
        "lang", langid_ngram_expr(F.col("text")).alias("guess")
    ).collect()
    for r in got:
        assert r["guess"] == r["lang"], (r["lang"], r["guess"])


def test_langid_ngram_und_and_null(spark):
    df = spark.createDataFrame(
        [("zz",), ("12345 67890",), (None,)], "text string"
    )
    got = [
        r["g"]
        for r in df.select(
            langid_ngram_expr(F.col("text")).alias("g")
        ).collect()
    ]
    assert got[0] == "und"  # too short for a trigram
    assert got[1] == "und"  # no profile gram matches
    assert got[2] is None


def test_profile_generator_is_deterministic_and_committed():
    """The committed langid_data.py is exactly what the generator
    produces (same check style as the marc8 table generator)."""
    import sys

    sys.path.insert(0, "/root/repo")
    from tools.gen_langid_profiles import build_profiles
    from traject_spark.corpus.langid_data import LANGID_PROFILES

    assert build_profiles() == LANGID_PROFILES
    assert len(LANGID_PROFILES) >= 20
    # profiles are disjoint by construction (unique-to-language grams)
    seen: dict[str, str] = {}
    for lang, grams in LANGID_PROFILES.items():
        for g in grams:
            assert g not in seen, (g, lang, seen.get(g))
            seen[g] = lang


def test_gopher_and_langid_plans_stay_narrow(spark):
    """Both operators are scan-speed expressions: zero Exchange in the
    executed plan (the 100 TB property)."""
    from traject_spark.corpus import gopher_repetition_expr

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = df.select(
        gopher_quality_expr(F.col("text")).alias("g"),
        langid_ngram_expr(F.col("text")).alias("l"),
        gopher_repetition_expr(F.col("text")).alias("r"),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# Gopher §A1.2 repetition signals (round 14)
# ---------------------------------------------------------------------------

def _rep(spark, text):
    from traject_spark.corpus import gopher_repetition_expr

    df = spark.createDataFrame([(text,)], "text string")
    return df.select(
        gopher_repetition_expr(F.col("text")).alias("r")
    ).collect()[0]["r"]


def test_repetition_dup_lines_hand_computed(spark):
    # 4 lines: "aa" twice, "bb", "cc" -> 1 repeat occurrence / 4 lines
    text = "aa\nbb\naa\ncc"
    r = _rep(spark, text)
    assert r["dup_line_frac"] == 0.25
    # repeat chars = len("aa") = 2; total chars = len(text) = 11
    assert r["dup_line_char_frac"] == round(2 / 11, 4)
    # one paragraph (no blank line): no paragraph duplicates
    assert r["dup_para_frac"] == 0.0
    # every gate clears: 0.25 <= 0.30 lines, 0.1818 <= 0.20 chars,
    # one paragraph, and no spaces means no word n-grams at all
    assert r["passes"] is True


def test_repetition_paragraphs_and_gates(spark):
    # 3 paragraphs, two identical -> dup_para_frac 1/3 > 0.30 fails
    text = "para one here\n\npara two\n\npara one here"
    r = _rep(spark, text)
    assert r["dup_para_frac"] == round(1 / 3, 4)
    assert r["dup_para_char_frac"] == round(len("para one here") / len(text), 4)
    assert r["passes"] is False


def test_repetition_top_ngram_char_frac(spark):
    # "the cat sat the cat ran" -> top 2-gram "the cat" x2, 7 chars
    text = "the cat sat the cat ran"
    r = _rep(spark, text)
    assert r["top_2gram_char_frac"] == round(2 * len("the cat") / len(text), 4)
    # no 3-gram repeats
    assert r["top_3gram_char_frac"] == 0.0
    assert r["top_4gram_char_frac"] == 0.0


def test_repetition_clean_doc_passes_and_nulls(spark):
    clean = "a genuinely varied document with no repeated content at all"
    r = _rep(spark, clean)
    assert r["passes"] is True
    assert all(
        r[k] == 0.0
        for k in (
            "dup_line_frac", "dup_para_frac", "dup_line_char_frac",
            "dup_para_char_frac", "top_2gram_char_frac",
        )
    )
    assert _rep(spark, None) is None


def test_repetition_short_doc_no_phantom_ngrams(spark):
    # 1 token: no 2/3/4-grams (the sequence guard), nothing blows up
    r = _rep(spark, "single")
    assert r["top_2gram_char_frac"] == 0.0
    assert r["passes"] is True


def test_repetition_arrow_path_matches_column_path(spark):
    """The r16 Arrow fast path (default) must be bit-identical to the
    pure-Column sorted-run formulation: full test corpus + adversarial
    edge strings (empty, space runs, CRLF, unicode, trailing newlines,
    heavy repeats straddling the 4dp rounding)."""
    from traject_spark.corpus import gopher_repetition_expr

    corpus = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("text")
    edges = spark.createDataFrame(
        [
            (None,),
            ("",),
            (" ",),
            ("   ",),
            ("\n",),
            ("\n\n\n",),
            ("a\r\nb\r\na\r\n",),
            ("x y x y x y x y",),
            ("téxt ünïcode téxt ünïcode",),
            ("one\ntwo\n\n\ntwo\n\none\n",),
            ("w " * 2000,),
            ("a b c " * 700,),
            ("é́ combining é́ combining",),
        ],
        "text string",
    )
    df = corpus.union(edges)
    both = df.select(
        gopher_repetition_expr(F.col("text"), use_arrow=True).alias("a"),
        gopher_repetition_expr(F.col("text"), use_arrow=False).alias("j"),
    )
    n_diff = both.filter(~F.col("a").eqNullSafe(F.col("j"))).count()
    assert n_diff == 0


# ---------------------------------------------------------------------------
# C4-style cleaning (round 14)
# ---------------------------------------------------------------------------

def _c4(spark, text):
    from traject_spark.corpus import c4_clean_expr, c4_quality_expr

    df = spark.createDataFrame([(text,)], "text string")
    row = df.select(
        c4_quality_expr(F.col("text")).alias("q"),
        c4_clean_expr(F.col("text")).alias("clean"),
    ).collect()[0]
    return row["q"], row["clean"]


def test_c4_line_rules_hand_computed(spark):
    text = (
        "This line has the required five words.\n"   # kept
        "Too short to keep.\n"                        # <5 words
        "this one mentions javascript so it goes.\n"  # javascript
        "No terminal punctuation on this line here\n"  # no punct
        'A quoted ending also counts as terminal."'   # kept (quote)
    )
    q, clean = _c4(spark, text)
    assert q["n_lines"] == 5
    assert q["kept_line_frac"] == round(2 / 5, 4)
    assert clean == (
        "This line has the required five words.\n"
        'A quoted ending also counts as terminal."'
    )
    # cleaned text has 2 terminal marks -> below the 3-sentence gate
    assert q["n_sentences"] == 2
    assert q["passes"] is False


def test_c4_page_drops_and_pass(spark):
    good = (
        "The first sentence is here and long enough.\n"
        "The second sentence also has plenty of words.\n"
        "The third sentence completes the page nicely."
    )
    q, clean = _c4(spark, good)
    assert q["passes"] is True and q["kept_line_frac"] == 1.0
    assert clean == good

    q, _ = _c4(spark, good + "\nA stray { brace dooms the page entirely.")
    assert q["has_curly_brace"] is True and q["passes"] is False

    q, _ = _c4(spark, good + "\nThen Lorem Ipsum filler text appears here.")
    assert q["has_lorem_ipsum"] is True and q["passes"] is False


def test_c4_null_and_empty(spark):
    q, clean = _c4(spark, None)
    assert q is None and clean is None
    q, clean = _c4(spark, "")
    assert q["n_lines"] == 1 and q["kept_line_frac"] == 0.0
    assert clean == "" and q["passes"] is False


def test_c4_crlf_lines_behave_like_lf(spark):
    """Review fix (r14): Java's $ matches before a trailing \\r while
    RE2's does not — the \\z anchor + explicit trailing-ws strip makes
    CRLF documents keep the same lines as their LF twins on BOTH
    engines (DuckDB cross-checked here with the twin's exact predicate)."""
    import duckdb

    lf = (
        "This line has the required five words.\n"
        "Another complete sentence sits right here.\n"
        "too short."
    )
    crlf = lf.replace("\n", "\r\n")
    q_lf, clean_lf = _c4(spark, lf)
    q_crlf, clean_crlf = _c4(spark, crlf)
    assert q_lf["kept_line_frac"] == q_crlf["kept_line_frac"] > 0
    assert q_lf["n_sentences"] == q_crlf["n_sentences"]
    # DuckDB twin predicate agrees on the CRLF lines
    kept = duckdb.sql(
        "SELECT len(list_filter(string_split(?, chr(10)), l -> "
        "regexp_matches(regexp_replace(l, '[ \\t\\r\\n\\f]+$', ''), "
        "'[.!?\"]\\z') "
        "AND len(list_filter(string_split(l, ' '), w -> w <> '')) >= 5 "
        "AND NOT contains(lower(l), 'javascript')))",
        params=[crlf],
    ).fetchone()[0]
    assert kept == round(q_crlf["kept_line_frac"] * q_crlf["n_lines"])


def test_c4_badword_gate_semantics(spark):
    """User-supplied bad-words page gate (VERDICT r14 #4): word-boundary
    case-insensitive match per the public C4 implementation — 'ass'
    must not match 'class', phrases match across spaces, punctuation in
    listed words is escaped, NULL text stays NULL."""
    from pyspark.sql import functions as F

    from traject_spark.corpus import c4_badword_gate_expr

    gate = c4_badword_gate_expr(["badword", "two word phrase", "a.c"])
    rows = spark.createDataFrame(
        [
            (0, "a perfectly clean page of text."),
            (1, "this contains BadWord right here."),     # case-insensitive
            (2, "notabadwordat all, just embedded."),     # substring: keep
            (3, "the two word phrase appears."),          # phrase
            (4, "punctuated a.c token matches."),         # escaped literal
            (5, "but abc and axc stay clean here."),       # '.' escaped
            (6, "badword"),                               # whole-string edge
            (7, None),
        ],
        "doc_id long, text string",
    ).select("doc_id", gate.alias("keep")).collect()
    got = {r["doc_id"]: r["keep"] for r in rows}
    assert got == {
        0: True, 1: False, 2: True, 3: False,
        4: False, 5: True, 6: False, 7: None,
    }
    # empty / whitespace-only lists gate nothing
    triv = c4_badword_gate_expr(["", "  "])
    vals = spark.createDataFrame(
        [(0, "anything."), (1, None)], "doc_id long, text string"
    ).select(triv.alias("keep")).collect()
    assert [v["keep"] for v in vals] == [True, None]


def test_c4_badword_gate_duckdb_parity(spark):
    """The gate's one compiled alternation sits in the Java/RE2
    intersection: DuckDB running the IDENTICAL pattern string agrees
    on every row (same discipline as the PII patterns)."""
    import re

    import duckdb
    from pyspark.sql import functions as F

    from traject_spark.corpus import c4_badword_gate_expr

    words = ["badword", "two word phrase", "a.c", "don't"]
    cleaned = sorted({w.strip().lower() for w in words if w.strip()})
    pat = (
        "(?:^|\\W)(?:" + "|".join(re.escape(w) for w in cleaned) + ")(?:\\W|$)"
    )
    cases = [
        (0, "a clean page."), (1, "BADWORD!"), (2, "class act."),
        (3, "the two word phrase."), (4, "a.c"), (5, "abc"),
        (6, "she said don't stop."), (7, "donut time."),
    ]
    got = (
        spark.createDataFrame(cases, "doc_id long, text string")
        .select("doc_id", c4_badword_gate_expr(words).alias("keep"))
        .collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE d(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", cases)
    want = dict(
        con.execute(
            "SELECT doc_id, NOT regexp_matches(lower(text), ?) FROM d",
            [pat],
        ).fetchall()
    )
    assert {r["doc_id"]: r["keep"] for r in got} == want
