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


def cdc_chunk_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    gram: int = 3,
    divisor: int = 16,
) -> DataFrame:
    """Content-defined chunking (Rabin-style) with chunk-level dedup
    stats — the storage/dedup primitive fixed-size windows can't give
    you: because boundaries are a pure function of local CONTENT (a
    token ``gram``-gram hash hitting ``0 mod divisor``), inserting a
    sentence shifts only the chunks it touches, so unchanged spans keep
    their fingerprints and still dedup across documents. (The
    simplification vs FastCDC: no min/max chunk bounds — those are
    sequentially dependent; the pure mod rule keeps every boundary
    decision independent, which is what lets the whole thing run as
    windows + aggregations. Mean chunk length ≈ ``divisor`` tokens.)

    Per document: token count, chunk count, and how many of its chunks
    are SHARED (appear in ≥2 documents) — the chunk-level duplication
    signal.

    Scale shape: one posexplode, per-document lag/cumsum windows
    (partition by doc — bounded), one ordered per-chunk reassembly
    (bounded by chunk length), one md5-keyed doc-frequency aggregate,
    one join back. The hash is md5-derived (not xxhash64) so a plain
    SQL oracle reproduces every boundary bit-for-bit.
    """
    from pyspark.sql import Window  # noqa: PLC0415

    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("pos", "tok"),
    ).filter(F.length("tok") > 0)
    w = Window.partitionBy("doc_id").orderBy("pos")
    gram_cols = [F.lag("tok", gram - 1 - i).over(w) for i in range(gram)]
    gram_str = F.concat_ws(" ", *gram_cols)
    h = F.conv(F.substring(F.md5(gram_str), 1, 15), 16, 10).cast("long")
    # positions before the first full gram can never cut; a boundary
    # AFTER token p means p+1 starts the next chunk
    is_cut = F.when(
        F.row_number().over(w) >= gram, (h % divisor == 0).cast("int")
    ).otherwise(F.lit(0))
    with_cut = toks.withColumn("cut", is_cut)
    chunk_id = (
        F.coalesce(
            F.sum("cut").over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        )
        + 1
    )
    chunks = (
        with_cut.withColumn("chunk_id", chunk_id)
        .groupBy("doc_id", "chunk_id")
        .agg(
            F.count("*").cast("long").alias("chunk_tokens"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("pos", "tok"))
                        ),
                        lambda s: s.tok,
                    ),
                    " ",
                )
            ).alias("chunk_md5"),
        )
    )
    freq = chunks.groupBy("chunk_md5").agg(
        F.countDistinct("doc_id").alias("df")
    )
    return (
        chunks.join(freq, "chunk_md5")
        .groupBy("doc_id")
        .agg(
            F.sum("chunk_tokens").cast("long").alias("n_tokens"),
            F.count("*").cast("long").alias("n_chunks"),
            F.sum(F.when(F.col("df") >= 2, 1).otherwise(0))
            .cast("long")
            .alias("n_shared_chunks"),
        )
        .orderBy("doc_id")
    )
