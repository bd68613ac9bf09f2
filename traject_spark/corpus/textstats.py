"""Text-analysis operators: token counting, quality scoring, language ID,
document fingerprinting.

All pure Column expressions (JVM-side, whole-stage codegen, no UDF/shuffle)
— at 100 TB these run at scan speed. Each has an exact ANSI-SQL twin used
by the DuckDB oracle in ``__spark_entry__``; keep semantics SQL-expressible
(simple space tokenization, fixed stopword lists) so the correctness gate
stays meaningful.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from traject_spark.expr import let

#: small fixed stopword list (quality scoring + language id)
EN_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is"]
DE_MARKERS = ["der", "die", "das", "und", "ist", "nicht"]
FR_MARKERS = ["le", "la", "les", "et", "est", "une"]
ES_MARKERS = ["el", "los", "las", "es", "una", "y"]


def tokens_expr(text: Column) -> Column:
    """Simple space tokenization (SQL-twin: string_split(text, ' '))."""
    return F.split(text, " ")


def token_count_expr(text: Column) -> Column:
    # explicit NULL-text guard: under Spark 3.x legacy defaults
    # (spark.sql.legacy.sizeOfNull=true) size(NULL) is -1, not NULL —
    # the when() pins NULL-in -> NULL-out on every supported version
    return F.when(
        text.isNotNull(), F.size(tokens_expr(text)).cast("long")
    )


def _count_in(tokens: Column, words: list[str]) -> Column:
    return F.size(F.filter(tokens, lambda t: t.isin(words))).cast("long")


def stopword_ratio_expr(text: Column, stopwords: list[str] | None = None) -> Column:
    """Fraction of tokens that are stopwords, 4dp. An explicitly-passed
    empty list means "no stopwords" (ratio 0), not the English default."""
    sw = EN_STOPWORDS if stopwords is None else stopwords
    # when(): NULL text -> NULL ratio on Spark 3.x legacy sizeOfNull too
    return F.when(
        text.isNotNull(),
        let(
            tokens_expr(text),
            lambda toks: F.round(
                _count_in(toks, sw) / F.greatest(F.size(toks), F.lit(1)), 4
            ),
        ),
    )


def punct_ratio_expr(text: Column) -> Column:
    """Fraction of characters that are punctuation, 4dp."""
    return let(
        text,
        lambda t: F.round(
            (F.length(t) - F.length(F.regexp_replace(t, r"[\.,;:!\?]", "")))
            / F.greatest(F.length(t), F.lit(1)),
            4,
        ),
    )


def quality_score_expr(text: Column, min_tokens: int = 50, max_tokens: int = 100000) -> Column:
    """Heuristic quality score in [0,1]: length gate x stopword signal.

    A document scores 1.0 when it has a plausible token count AND a
    plausible stopword ratio; components degrade independently. 4dp.
    Tokenizes ONCE: both the count and the stopword ratio derive from a
    single let-bound split, not two copies of the split subtree.
    """
    return let(
        tokens_expr(text),
        lambda toks: let(
            F.size(toks).cast("long"),
            lambda n: let(
                F.round(
                    _count_in(toks, EN_STOPWORDS)
                    / F.greatest(F.size(toks), F.lit(1)),
                    4,
                ),
                lambda swr: F.round(
                    F.when((n >= min_tokens) & (n <= max_tokens), F.lit(0.5)).otherwise(F.lit(0.0))
                    + F.when((swr >= 0.05) & (swr <= 0.6), F.lit(0.5)).otherwise(F.lit(0.0)),
                    4,
                ),
            ),
        ),
    )


def langid_expr(text: Column) -> Column:
    """Marker-word language guess: highest marker count wins, ties broken
    en > de > fr > es; 'und' when no markers hit."""
    # outer when(): on Spark 3.x legacy sizeOfNull, size(filter(NULL))
    # is -1 and every count would tie at -1 ('en'); the explicit text
    # guard pins NULL-text -> NULL guess on every supported version
    # (the mx.isNull() branch inside _argmax_lang covers Spark 4 alone)
    return F.when(
        text.isNotNull(),
        let(
            tokens_expr(text),
            lambda toks: _argmax_lang(
                _count_in(toks, EN_STOPWORDS),
                _count_in(toks, DE_MARKERS),
                _count_in(toks, FR_MARKERS),
                _count_in(toks, ES_MARKERS),
            ),
        ),
    )


def _argmax_lang(en: Column, de: Column, fr: Column, es: Column) -> Column:
    # each count is a token-array scan; let-bind them (and the max) so
    # the when-chain references bound variables instead of re-evaluating
    # every count subtree per comparison (greatest + 4 comparisons would
    # otherwise scan the token array ~16x per row instead of 4)
    from traject_spark.expr import let3

    def pick(e: Column, d: Column, f: Column, s: Column) -> Column:
        return let(
            F.greatest(e, d, f, s),
            lambda mx: (
                # NULL text -> NULL guess: without the guard every when()
                # condition is NULL (falsy) and control would fall through
                # to the otherwise branch, mislabeling missing text as 'es'
                F.when(mx.isNull(), F.lit(None).cast("string"))
                .when(mx == 0, F.lit("und"))
                .when(e == mx, F.lit("en"))
                .when(d == mx, F.lit("de"))
                .when(f == mx, F.lit("fr"))
                .otherwise(F.lit("es"))
            ),
        )

    return let(en, lambda e: let3(de, fr, es, lambda d, f, s: pick(e, d, f, s)))


def fingerprint_expr(text: Column, normalize: bool = True) -> Column:
    """128-bit content fingerprint (md5 hex). ``normalize`` lowercases,
    collapses whitespace, and trims the ends first — the usual
    exact-dedup key (web-scraped corpora routinely differ only by a
    trailing newline; without the trim those are distinct fingerprints
    and exact dedup silently misses them)."""
    t = text
    if normalize:
        t = F.trim(F.regexp_replace(F.lower(t), r"\s+", " "))
    return F.md5(t)
