"""Line-level corpus deduplication (the C4 / RefinedWeb rule).

Green-field training-data operator beyond the reference surface
(SURVEY.md §2.5): web-scale corpora carry massive boilerplate at the
LINE level (nav bars, cookie banners, license footers) that
document-level dedup never sees. The standard fix — C4's "discard every
repeated line, keeping one global occurrence" — needs a corpus-global
decision per distinct line, which is exactly a keyed aggregation, so it
scales the same way exact document dedup does.

Scale shape: one ``posexplode`` (map-side), one map-combinable
aggregation keyed by a 16-byte line fingerprint to elect each line's
global survivor, one join back on the same fingerprint, one final
aggregation keyed by document id. No window over the corpus, no
quadratic stage; shuffle payloads carry fingerprints + line offsets,
and the line TEXT crosses an exchange only inside the per-document
reassembly (bounded by lines-per-document).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def wrap_tokens_to_lines(col: Column, tokens_per_line: int = 10) -> Column:
    """Deterministically re-wrap running text into fixed-width token
    "lines" (array<string>): tokens ``[0,k)``, ``[k,2k)``, … re-joined
    with single spaces.

    Corpora that arrive as one physical line per document (the testdata
    corpus, many JSONL exports) have no newline structure for line-level
    rules to act on; this wrap restores a deterministic line structure
    both the engine and any SQL oracle can reproduce exactly.
    """
    if tokens_per_line <= 0:
        raise ValueError("tokens_per_line must be positive")
    toks = F.split(F.lower(F.trim(col)), r"\s+")
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.size(toks) - 1, F.lit(0)),
        F.lit(tokens_per_line),
    )
    return F.transform(
        starts,
        lambda s: F.array_join(F.slice(toks, s + 1, tokens_per_line), " "),
    )


def line_dedup_stats(
    df: DataFrame, lines_col: str = "lines", id_col: str = "doc_id"
) -> DataFrame:
    """C4-style global line dedup, reported per document.

    A line occurrence SURVIVES iff it is the corpus-global first
    occurrence of its exact text — "first" meaning the minimum
    ``(doc_id, line_idx)`` pair, which is retry-stable and
    engine-portable (no hash-order dependence). Every other occurrence
    is removed.

    Output, one row per document:
      - ``n_lines``  — lines before dedup
      - ``n_kept``   — surviving lines
      - ``kept_md5`` — md5 of the surviving lines re-joined with
        ``\\n`` in original order (pins the exact cleaned CONTENT, not
        just its size, while keeping the row scalar)

    Survivor election is ``min(struct(doc_id, line_idx))`` grouped by a
    16-byte md5 line fingerprint — map-side combinable, one shuffle on
    the fingerprint. The md5 (not xxhash64) keeps accidental
    fingerprint collisions out of the dedup decision at corpus scale.
    A boilerplate line present in a large fraction of all documents
    makes its fingerprint a hot join key on the winners join-back —
    that join is an ordinary shuffle join, so AQE's skew-join split
    (on in the session factory) absorbs it.
    """
    from .dedup import _spread  # noqa: PLC0415

    # _spread: the explode + md5 fingerprinting is CPU-bound and
    # otherwise runs inside however few splits the scan yields.
    ex = _spread(df, id_col).select(
        F.col(id_col), F.posexplode(lines_col).alias("line_idx", "line")
    ).withColumn("__fp", F.md5("line"))
    winners = ex.groupBy("__fp").agg(
        F.min(F.struct(F.col(id_col).alias("d"), F.col("line_idx").alias("i"))).alias(
            "__w"
        )
    )
    kept = ex.join(winners, "__fp").withColumn(
        "__keep",
        (F.col(id_col) == F.col("__w.d")) & (F.col("line_idx") == F.col("__w.i")),
    )
    kept_lines = F.transform(
        F.array_sort(
            F.collect_list(
                F.when(F.col("__keep"), F.struct("line_idx", "line"))
            )
        ),
        lambda s: s["line"],
    )
    return kept.groupBy(id_col).agg(
        F.count("*").alias("n_lines"),
        F.sum(F.col("__keep").cast("long")).alias("n_kept"),
        F.md5(F.array_join(kept_lines, "\n")).alias("kept_md5"),
    )
