"""A/B: top-n-gram char-mass formulations (VERDICT r14 #3).

The current gopher_repetition_expr builds and string-sorts a fresh gram
array per n (n=2,3,4) over the same token array. Candidates measured
here, min-of-N wall on the sf0.1 documents corpus, outputs
cross-checked identical row-for-row before timing counts:

- current: three separate string sorts (_top_ngram_char_sum as shipped)
- combined: one string sort of the tagged union of all three gram
  arrays ("2:gram"/"3:gram"/"4:gram" prefixes keep classes separable in
  one sorted pass)
- hashsort: three sorts of struct(xxhash64(gram), length(gram)) — long
  comparisons instead of string comparisons; char mass from the stored
  length (collision-robustness argument mirrors corpus_decontaminate)
- hashcombined: one sort of struct(n, xxhash64(gram), length(gram))

Run: python tools/ab_topgram_r15.py [runs_per_variant]
"""

import sys
import time

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

from traject_spark.corpus.textstats import (
    _nonempty_tokens,
    _top_ngram_char_sum,
    tokens_expr,
    word_ngrams_expr,
)
from traject_spark.expr import let

SF_DIR = "/root/testdata/sf0.1"


def _tagged(words: Column, n: int) -> Column:
    return F.transform(
        word_ngrams_expr(words, n), lambda g: F.concat(F.lit(f"{n}:"), g)
    )


def combined_top_ngrams(words: Column) -> Column:
    """struct(t2, t3, t4) char masses from ONE sort of the tagged union."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("b2"),
        F.lit(0).cast("long").alias("b3"),
        F.lit(0).cast("long").alias("b4"),
    )

    def step(acc: Column, x: Column) -> Column:
        run = F.when(acc["prev"] == x, acc["run"] + 1).otherwise(
            F.lit(1).cast("long")
        )

        def upd(best: Column, tag: str) -> Column:
            return lambda r: F.greatest(
                best,
                F.when(
                    (r >= 2) & (F.substring(x, 1, 1) == tag),
                    r * (F.length(x) - 2),
                ).otherwise(F.lit(0).cast("long")),
            )

        return let(
            run,
            lambda r: F.struct(
                x.alias("prev"),
                r.alias("run"),
                upd(acc["b2"], "2")(r).alias("b2"),
                upd(acc["b3"], "3")(r).alias("b3"),
                upd(acc["b4"], "4")(r).alias("b4"),
            ),
        )

    allgrams = F.concat(_tagged(words, 2), _tagged(words, 3), _tagged(words, 4))
    return F.aggregate(
        F.array_sort(allgrams),
        init,
        step,
        lambda acc: F.struct(
            acc["b2"].alias("t2"), acc["b3"].alias("t3"), acc["b4"].alias("t4")
        ),
    )


def hash_top_ngram(words: Column, n: int) -> Column:
    """One n's char mass from a sort of struct(hash, len) longs."""
    hl = F.transform(
        word_ngrams_expr(words, n),
        lambda g: F.struct(
            F.xxhash64(g).alias("h"), F.length(g).cast("long").alias("l")
        ),
    )
    init = F.struct(
        F.lit(None).cast("long").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )

    def step(acc: Column, x: Column) -> Column:
        run = F.when(acc["prev"] == x["h"], acc["run"] + 1).otherwise(
            F.lit(1).cast("long")
        )
        return let(
            run,
            lambda r: F.struct(
                x["h"].alias("prev"),
                r.alias("run"),
                F.greatest(
                    acc["best"],
                    F.when(r >= 2, r * x["l"]).otherwise(F.lit(0).cast("long")),
                ).alias("best"),
            ),
        )

    return F.aggregate(F.array_sort(hl), init, step, lambda a: a["best"])


def hash_combined_top_ngrams(words: Column) -> Column:
    """struct(t2, t3, t4) from ONE sort of struct(n, hash, len)."""

    def tag(n: int) -> Column:
        return F.transform(
            word_ngrams_expr(words, n),
            lambda g: F.struct(
                F.lit(n).cast("long").alias("n"),
                F.xxhash64(g).alias("h"),
                F.length(g).cast("long").alias("l"),
            ),
        )

    init = F.struct(
        F.lit(None).cast("long").alias("pn"),
        F.lit(None).cast("long").alias("ph"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("b2"),
        F.lit(0).cast("long").alias("b3"),
        F.lit(0).cast("long").alias("b4"),
    )

    def step(acc: Column, x: Column) -> Column:
        run = F.when(
            (acc["pn"] == x["n"]) & (acc["ph"] == x["h"]), acc["run"] + 1
        ).otherwise(F.lit(1).cast("long"))

        def upd(best: Column, n: int):
            return lambda r: F.greatest(
                best,
                F.when((r >= 2) & (x["n"] == n), r * x["l"]).otherwise(
                    F.lit(0).cast("long")
                ),
            )

        return let(
            run,
            lambda r: F.struct(
                x["n"].alias("pn"),
                x["h"].alias("ph"),
                r.alias("run"),
                upd(acc["b2"], 2)(r).alias("b2"),
                upd(acc["b3"], 3)(r).alias("b3"),
                upd(acc["b4"], 4)(r).alias("b4"),
            ),
        )

    allgrams = F.concat(tag(2), tag(3), tag(4))
    return F.aggregate(
        F.array_sort(allgrams),
        init,
        step,
        lambda acc: F.struct(
            acc["b2"].alias("t2"), acc["b3"].alias("t3"), acc["b4"].alias("t4")
        ),
    )


def main():
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    ws = _nonempty_tokens(tokens_expr(F.col("text")))

    def current(df):
        return df.select(
            "doc_id",
            let(
                ws,
                lambda w: F.struct(
                    _top_ngram_char_sum(w, 2).alias("t2"),
                    _top_ngram_char_sum(w, 3).alias("t3"),
                    _top_ngram_char_sum(w, 4).alias("t4"),
                ),
            ).alias("t"),
        ).select("doc_id", "t.*")

    def combined(df):
        return df.select(
            "doc_id", let(ws, combined_top_ngrams).alias("t")
        ).select("doc_id", "t.*")

    def hashsort(df):
        return df.select(
            "doc_id",
            let(
                ws,
                lambda w: F.struct(
                    hash_top_ngram(w, 2).alias("t2"),
                    hash_top_ngram(w, 3).alias("t3"),
                    hash_top_ngram(w, 4).alias("t4"),
                ),
            ).alias("t"),
        ).select("doc_id", "t.*")

    def hashcombined(df):
        return df.select(
            "doc_id", let(ws, hash_combined_top_ngrams).alias("t")
        ).select("doc_id", "t.*")

    variants = {
        "current": current,
        "combined": combined,
        "hashsort": hashsort,
        "hashcombined": hashcombined,
    }

    # correctness cross-check first: all variants identical row-for-row
    # (text NULLs filtered: the full expr handles them via when(); here
    # we compare raw masses)
    base = None
    nn = docs.filter(F.col("text").isNotNull())
    for name, fn in variants.items():
        got = sorted(tuple(r) for r in fn(nn).collect())
        if base is None:
            base = got
            print(f"[check] {name}: {len(got)} rows (baseline)")
        else:
            same = got == base
            print(f"[check] {name}: identical={same}")
            if not same:
                diff = [
                    (a, b) for a, b in zip(base, got) if a != b
                ][:3]
                print("  first diffs:", diff)
                raise SystemExit(f"{name} diverges — not a candidate")

    results = {}
    for name, fn in variants.items():
        times = []
        for _ in range(runs):
            t0 = time.time()
            fn(docs).write.format("noop").mode("overwrite").save()
            times.append(time.time() - t0)
        results[name] = times
        print(f"{name}: min={min(times):.3f} all={[round(t,3) for t in times]}")

    import json

    print(json.dumps({"sf": 0.1, "runs": runs, "times": results}))


if __name__ == "__main__":
    main()
