"""Char-granularity exact substring dedup via winnowing — the
character-level span detector the token families don't cover.

Capability ladder this completes: q90/q91/q91b-d find WHOLE-document
dups, q120 finds repeated TOKEN spans within the corpus vocabulary,
q124 flags doc pairs sharing mod-p-sampled char fingerprints
(Manber's order-free sampling — probabilistic: a shared run can fall
between kept fingerprints).  This is the winnowing form (Schleimer,
Wilkerson & Aiken, "Winnowing: Local Algorithms for Document
Fingerprinting", SIGMOD 2003 — public; the Lee et al. 2022 "Deduplicating
Training Data Makes Language Models Better" exact-substring capability
re-expressed for Spark): selecting the minimum-hash k-gram of EVERY
w-window carries the positional guarantee that any substring of length
>= w + k - 1 shared by two documents yields at least one shared
selected fingerprint — detection is deterministic, not probabilistic,
and the match is LOCALIZED (positions come out), so shared spans can
be measured, not just flagged.

Output of ``substring_dup_spans``, per detected doc pair: how many
distinct winnowed k-grams they share, how many contiguous shared runs
those matches form, and the longest verified shared substring length.
Runs are built on match DIAGONALS (pos_a - pos_b): two same-diagonal
matches <= k apart overlap or abut, so a maximal chain of them is one
contiguous shared substring of (last - first + k) chars — exact span
arithmetic, the q169 islands idiom on the match frame.

100 TB posture: the gram explode is linear in corpus characters and
feeds ONE ordered window pass per doc (the winnow selection — frame
width w); everything downstream runs on the ~2/(w+1)-selected
fingerprint frame.  Pair generation joins fingerprints by gram with
q124's boilerplate suppression (grams in > max_df docs are dropped
before pairing — the quadratic-blowup guard), so per-gram fan-out is
<= max_df^2/2.  Span assembly windows partition by (pair, diagonal) —
match-frame sized.  No all-pairs stage anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 32,
    w: int = 8,
) -> DataFrame:
    """Winnowed k-gram fingerprints: (id_col, pos, gram), one row per
    SELECTED position — the (hash asc, pos desc)-minimum of every
    complete w-window of consecutive k-gram positions (the rightmost-
    on-tie rule of the winnowing paper), distinct per doc.  The hash
    is the first 60 bits of md5(gram) as a BIGINT — numerically equal
    to ordering by the 15-char hex prefix, but compared as one long in
    the window's frame-slide re-aggregation.

    Selection is engine-replayable: md5 of the literal substring, so a
    DuckDB oracle reproduces the identical fingerprint set (the prefix
    int is CAST('0x' || substring(md5, 1, 15)) there; the fixture
    corpus is ASCII, and multi-byte text only requires that both
    engines count substring offsets in code points — they do).

    Docs shorter than k + w - 1 chars have no complete window and
    contribute no fingerprints (the winnowing guarantee starts at
    shared runs of w + k - 1 chars anyway); length screening happens
    here, not in the caller.
    """
    n_grams = F.length(text_col) - k + 1
    # _n rides along from the projection (it is length-derived), so no
    # second count-window pass over the gram frame is needed to find
    # the complete-window bound; _h is hashed ONCE per gram row here —
    # hashing inside the window aggregate would re-evaluate it on
    # every frame slide (w times per row; the first 16x probe's
    # superlinear wall)
    g = (
        df.where(F.length(text_col) >= k + w - 1)
        .select(
            F.col(id_col),
            F.col(text_col),
            n_grams.alias("_n"),
            F.explode(F.sequence(F.lit(1), n_grams)).alias("pos"),
        )
        .select(
            id_col,
            "pos",
            "_n",
            F.expr(f"substring({text_col}, pos, {k})").alias("gram"),
        )
        .select(
            id_col,
            "pos",
            "_n",
            "gram",
            # 60-bit md5 prefix as BIGINT: the window's frame-slide
            # re-aggregation compares this long (first struct field)
            # instead of a 32-char hex string — the second 16x-probe
            # finding; numeric order == hex-prefix lexicographic
            # order, and DuckDB replays it as CAST('0x'||prefix)
            F.conv(
                F.substring(F.md5(F.col("gram").cast("binary")), 1, 15),
                16,
                10,
            )
            .cast("long")
            .alias("_h"),
        )
    )
    # one ordered pass: the winner of the window STARTING at each row
    # (positions are dense 1..n_grams, so a ROWS frame is a position
    # frame); -pos in the struct makes ties pick the RIGHTMOST
    # minimum, and pos/gram ride along uniquely determined
    sel_w = (
        Window.partitionBy(id_col).orderBy("pos").rowsBetween(0, w - 1)
    )
    winner = F.min(
        F.struct(
            F.col("_h").alias("h"),
            (-F.col("pos")).alias("neg"),
            F.col("pos").alias("p"),
            F.col("gram").alias("g"),
        )
    ).over(sel_w)
    return (
        g.select(id_col, "pos", "_n", winner.alias("win"))
        .where(F.col("pos") <= F.col("_n") - w + 1)  # complete windows
        .select(
            id_col,
            F.col("win.p").alias("pos"),
            F.col("win.g").alias("gram"),
        )
        .distinct()
    )


def substring_dup_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 32,
    w: int = 8,
    max_df: int = 50,
) -> DataFrame:
    """Cross-document shared-substring report: (doc_a, doc_b,
    n_shared_grams, n_runs, max_span_chars) for every doc pair sharing
    at least one winnowed fingerprint, doc_a < doc_b.

    - ``n_shared_grams``: distinct shared selected k-grams.
    - ``n_runs``: maximal same-diagonal chains of matches with
      successive gaps <= k.  Two same-diagonal matches at positions
      p1 < p2 with p2 - p1 <= k overlap or abut, so every chain is one
      CONTIGUOUS shared substring (verified by construction, no
      re-scan of the text needed).
    - ``max_span_chars``: the longest such chain's span,
      last - first + k — a certified lower bound on the pair's longest
      common substring (detection guaranteed for shared runs
      >= w + k - 1 whose fingerprints survive the max_df screen).

    Grams selected in more than ``max_df`` docs are dropped before
    pairing — corpus boilerplate would otherwise contribute a
    quadratic pair blowup (q124's suppression rule, same default).
    All outputs are exact integers; every stage is deterministic and
    DuckDB-replayable, so the entry hash-gates.
    """
    # TWO consumers (the df-screen and the pair join) — cut the
    # lineage so the gram explode + winnow window run once, not twice;
    # the fingerprint frame is ~2/(w+1) of the gram frame
    fp = winnow_fingerprints(df, id_col, text_col, k, w).localCheckpoint(
        eager=True
    )
    # a doc CAN select the same gram at several positions (a repeated
    # substring within one doc), so the df-screen counts distinct
    # docs, not fingerprint rows
    keep = (
        fp.groupBy("gram")
        .agg(F.countDistinct(id_col).alias("fp_df"))
        .where(F.col("fp_df") <= max_df)
        .select("gram")
    )
    fpk = fp.join(keep, "gram")
    a = fpk.select(
        F.col("gram"),
        F.col(id_col).alias("doc_a"),
        F.col("pos").alias("pos_a"),
    )
    b = fpk.select(
        F.col("gram"),
        F.col(id_col).alias("doc_b"),
        F.col("pos").alias("pos_b"),
    )
    pr = (
        a.join(b, "gram")
        .where(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            "gram",
            "pos_a",
            "pos_b",
            (F.col("pos_a") - F.col("pos_b")).alias("diag"),
        )
        .localCheckpoint(eager=True)  # two consumers: spans + counts
    )
    diag_w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy(
        "pos_a"
    )
    brk = F.when(
        F.col("pos_a") - F.lag("pos_a").over(diag_w) > k, 1
    ).otherwise(0)
    runs = (
        pr.select(
            "doc_a",
            "doc_b",
            "diag",
            "pos_a",
            brk.alias("brk"),
        )
        .select(
            "doc_a",
            "doc_b",
            "diag",
            "pos_a",
            F.sum("brk")
            .over(
                Window.partitionBy("doc_a", "doc_b", "diag")
                .orderBy("pos_a")
                .rowsBetween(Window.unboundedPreceding, 0)
            )
            .alias("run_id"),
        )
        .groupBy("doc_a", "doc_b", "diag", "run_id")
        .agg(
            (F.max("pos_a") - F.min("pos_a") + k).alias("span")
        )
        .groupBy("doc_a", "doc_b")
        .agg(
            F.count("*").cast("long").alias("n_runs"),
            F.max("span").cast("long").alias("max_span_chars"),
        )
    )
    shared = pr.groupBy("doc_a", "doc_b").agg(
        F.countDistinct("gram").cast("long").alias("n_shared_grams")
    )
    return shared.join(runs, ["doc_a", "doc_b"]).select(
        "doc_a",
        "doc_b",
        "n_shared_grams",
        "n_runs",
        "max_span_chars",
    )
