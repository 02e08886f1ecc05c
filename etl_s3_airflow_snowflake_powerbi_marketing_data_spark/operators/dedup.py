"""Deduplication operators for large-scale training-data pipelines.

Green-field additions beyond the reference surface (SURVEY.md §2.5):
exact dedup, MinHash+LSH near-dup, SimHash near-dup, and exact n-gram
Jaccard. All are pure DataFrame compositions — hashing via built-in
``xxhash64``/``md5`` (JVM-side, codegen), shingling via ``transform``
over token arrays, banding via ``posexplode`` — so the plans shuffle
only on the banded buckets, which is exactly the LSH scale story: at
100 TB you never compare all pairs, only rows sharing a band bucket.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_PATTERN = r"\s+"


def _tokens(col: Column) -> Column:
    """Whitespace tokenization of trimmed, lowercased text."""
    return F.split(F.lower(F.trim(col)), TOKEN_PATTERN)


def normalize_text(col: Column) -> Column:
    """Canonical form for exact dedup: lowercase, collapse whitespace."""
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def exact_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup groups: one row per duplicated normalized text with
    the survivor id (min id) and the duplicate count.

    Plan: hash-groupBy on a fingerprint of the normalized text —
    map-side combinable, one shuffle keyed by the 16-byte fingerprint
    (not the full text, so shuffle payload stays small at scale). md5
    rather than xxhash64 so the fingerprint is engine-portable and
    content-addressable downstream.
    """
    norm = df.select(
        F.col(id_col),
        F.md5(normalize_text(F.col(text_col))).alias("fingerprint"),
    )
    return (
        norm.groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("n_docs"),
        )
        .filter(F.col("n_docs") > 1)
    )


def dedup_exact(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep one survivor (min id) per distinct normalized text."""
    from pyspark.sql import Window  # noqa: PLC0415

    w = Window.partitionBy("__fp").orderBy(F.col(id_col))
    return (
        df.withColumn("__fp", F.xxhash64(normalize_text(F.col(text_col))))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__fp", "__rn")
    )


def word_shingles(col: Column, n: int = 3) -> Column:
    """Distinct word n-grams of a text column, as an array<string>.

    Built from ``transform`` over the token array — no UDF. Texts shorter
    than ``n`` tokens yield their full token-join as a single shingle so
    no document is silently dropped.
    """
    toks = _tokens(col)
    k = F.size(toks) - F.lit(n - 1)
    shingles = F.transform(
        F.sequence(F.lit(0), F.greatest(k - 1, F.lit(0))),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )
    return F.array_distinct(shingles)


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs above a threshold.

    Plan: explode shingles → self-join on shingle (pairs share ≥1
    shingle) → count common shingles per pair → Jaccard from the
    inclusion-exclusion sizes. The shuffle key is the shingle hash, so
    cost is proportional to shared-shingle pairs, not all pairs —
    still superlinear on hot shingles; MinHash (below) is the 100 TB
    path, this is the exact oracle-checkable baseline.
    """
    shingled = df.select(
        F.col(id_col).alias("id"),
        word_shingles(F.col(text_col), n).alias("shingles"),
    ).withColumn("set_size", F.size("shingles"))
    exploded = shingled.select(
        "id", "set_size", F.explode("shingles").alias("shingle")
    ).withColumn("sh", F.xxhash64("shingle")).drop("shingle")

    left = exploded.select(
        F.col("id").alias("id_a"), F.col("set_size").alias("size_a"), "sh"
    )
    right = exploded.select(
        F.col("id").alias("id_b"), F.col("set_size").alias("size_b"), "sh"
    )
    common = (
        left.join(right, "sh")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "size_a", "size_b")
        .agg(F.count("*").alias("n_common"))
    )
    jac = F.col("n_common") / (
        F.col("size_a") + F.col("size_b") - F.col("n_common")
    )
    trunc = F.floor(jac * 1000000.0) / 1000000.0
    return (
        common.withColumn("jaccard", trunc)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash signature per document: for each of ``num_hashes`` seeded
    hash functions, the min of ``xxhash64(seed-salted shingle)`` over the
    document's shingle set. Entirely JVM-side (``transform`` +
    ``array_min``); output column ``signature: array<bigint>``.
    """
    shingled = df.select(
        F.col(id_col).alias("id"),
        word_shingles(F.col(text_col), shingle_n).alias("shingles"),
    )
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda seed: F.array_min(
            F.transform(
                F.col("shingles"),
                lambda s: F.xxhash64(F.concat(seed.cast("string"), F.lit("|"), s)),
            )
        ),
    )
    return shingled.select("id", sig.alias("signature"))


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """LSH banding over MinHash signatures → candidate duplicate pairs.

    ``bands`` bands of ``num_hashes/bands`` rows; a pair is a candidate
    if any band hash collides. Plan: posexplode the banded signature →
    groupBy (band, band_hash) bucket join — the shuffle is on band
    buckets, never all-pairs. Candidates then get an exact Jaccard
    re-check in :func:`minhash_dedup_pairs` (classic LSH verify step).
    """
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_n)
    banded = sigs.select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.slice(
                                F.col("signature"),
                                b * rows_per_band + 1,
                                rows_per_band,
                            ),
                            lambda x: x.cast("string"),
                        ),
                    )
                ),
            )
        ).alias("band", "band_hash"),
    )
    left = banded.select(F.col("id").alias("id_a"), "band", "band_hash")
    right = banded.select(F.col("id").alias("id_b"), "band", "band_hash")
    return (
        left.join(right, ["band", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash-LSH near-dup pairs with exact Jaccard verification.

    The candidate set (band collisions) is re-checked with exact n-gram
    Jaccard, so output = exact pairs *that LSH surfaced* — the standard
    scale/recall tradeoff, tunable via bands/num_hashes.
    """
    candidates = minhash_lsh_candidates(
        df, text_col, id_col, num_hashes, bands, shingle_n
    )
    exact = ngram_jaccard_pairs(df, text_col, id_col, shingle_n, threshold)
    return candidates.join(exact, ["id_a", "id_b"]).select(
        "id_a", "id_b", "jaccard"
    )


def simhash(text_col: str, num_bits: int = 64) -> Column:
    """64-bit SimHash of a text column (by name), as a bigint.

    Per token: xxhash64 → for each bit, +1/-1 vote; sign of the summed
    vote per bit becomes the output bit. One pass over the token array
    via SQL higher-order functions (the SQL forms of shiftright/
    shiftleft accept expression bit-counts, unlike the Python wrappers).
    """
    n = num_bits
    sql = f"""
    aggregate(
      zip_with(
        aggregate(
          transform(split(lower(trim({text_col})), '\\\\s+'), t -> xxhash64(t)),
          array_repeat(0L, {n}),
          (acc, h) -> zip_with(
            acc, sequence(0, {n - 1}),
            (a, i) -> a + IF((shiftright(h, i) & 1L) = 1L, 1L, -1L))
        ),
        sequence(0, {n - 1}),
        (v, i) -> IF(v > 0, shiftleft(1L, i), 0L)
      ),
      0L,
      (acc, x) -> acc | x
    )
    """
    return F.expr(sql)


def simhash_near_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup pairs within a Hamming radius.

    Blocking: split the 64-bit simhash into ``max_hamming+1`` bands —
    by pigeonhole, any pair within the radius agrees exactly on ≥1 band,
    so the join key is (band, band_bits), never all-pairs. Verification
    computes the true Hamming distance via ``bit_count(xor)``.
    """
    n_bands = max_hamming + 1
    bits_per_band = 64 // n_bands
    hashed = df.select(
        F.col(id_col).alias("id"), simhash(text_col).alias("sh")
    )
    mask = (1 << bits_per_band) - 1
    band_exprs = [
        F.shiftright(F.col("sh"), b * bits_per_band).bitwiseAND(F.lit(mask))
        for b in range(n_bands)
    ]
    banded = hashed.select(
        "id",
        "sh",
        F.posexplode(F.array(*band_exprs)).alias("band", "band_bits"),
    )
    left = banded.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"), "band", "band_bits")
    right = banded.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"), "band", "band_bits")
    pairs = (
        left.join(right, ["band", "band_bits"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        pairs.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
