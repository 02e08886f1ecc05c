"""Byte-pair-encoding vocabulary training and distributed
tokenization — the sample-train / map-apply pattern of a real
tokenizer pipeline (Sennrich et al. 2016; the GPT-2 merge-rank apply
loop), shaped for a corpus that does not fit one machine.

Training runs DRIVER-SIDE on a deterministic, bounded sample (the
same bounded-driver-state argument as the PQ codebook and IVF
centroid trainers in ``operators/similarity.py``): production BPE
trainers never stream 100 TB through the merge loop either — they
train on a sample and APPLY everywhere. The apply pass is the one
deliberate pandas-UDF surface in this module: greedy lowest-rank
merging is an iterative per-token loop no built-in expression can
express, so it runs Arrow-batched with a per-batch word cache (Zipf
makes the cache hit rate high), map-only, no shuffle.

Everything is integer/string compute — no floats anywhere — so the
pure-Python oracle replica (tools/gen_expected.py:gen_bpe_tokens) is
exact by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

END = "</w>"


def _word_freqs(texts: list[str]) -> dict[tuple[str, ...], int]:
    freqs: dict[tuple[str, ...], int] = {}
    for t in texts:
        for w in (t or "").strip().lower().split():
            sym = tuple(list(w) + [END])
            freqs[sym] = freqs.get(sym, 0) + 1
    return freqs


def train_merges_on_texts(
    texts: list[str], n_merges: int = 50
) -> list[tuple[str, str]]:
    """Classic BPE training over a word-frequency table: per round,
    count adjacent symbol pairs weighted by word frequency, merge the
    most frequent pair (ties: lexicographically smallest pair — the
    pinned deterministic tie-break), stop early when no pair repeats.
    Pure integer counting on the vocab-bounded word table — O(vocab ×
    merges) driver work, independent of corpus size."""
    freqs = _word_freqs(texts)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, c in freqs.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        nxt: dict[tuple[str, ...], int] = {}
        for sym, c in freqs.items():
            out: list[str] = []
            i = 0
            while i < len(sym):
                if (
                    i + 1 < len(sym)
                    and sym[i] == best[0]
                    and sym[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            nxt[key] = nxt.get(key, 0) + c
        freqs = nxt
    return merges


def sample_texts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sample_docs: int = 500,
) -> list[str]:
    """Deterministic bounded training sample: the ``sample_docs``
    lowest ``xxhash64(id)`` documents (ties: ascending id). The plan
    is a TakeOrdered — per-partition top-N then one bounded merge,
    never a global sort — and the collect is O(sample) by
    construction."""
    rows = (
        df.select(
            F.col(text_col).alias("t"),
            F.xxhash64(F.col(id_col).cast("long")).alias("__h"),
            F.col(id_col).alias("__i"),
        )
        .orderBy("__h", "__i")
        .limit(sample_docs)
        .collect()
    )
    return [r["t"] for r in rows]


def train_bpe_merges(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_merges: int = 50,
    sample_docs: int = 500,
) -> list[tuple[str, str]]:
    return train_merges_on_texts(
        sample_texts(df, text_col, id_col, sample_docs), n_merges
    )


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> int:
    """Greedy merge-rank apply (the GPT-2 loop): repeatedly merge the
    present pair with the LOWEST training rank until none applies;
    returns the resulting token count."""
    sym = list(word) + [END]
    while len(sym) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_i = i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return len(sym)


def bpe_token_counts(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-wide tokenization under a trained merge list: per
    document, the whitespace word count and the BPE token count.
    Map-only Arrow-batched apply with a per-batch word→count cache;
    output is all-integer, so the oracle never touches a float."""
    ranks = {pair: i for i, pair in enumerate(merges)}
    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("n_words", LongType()),
            StructField("n_bpe_tokens", LongType()),
        ]
    )

    def batches(it):
        cache: dict[str, int] = {}
        for pdf in it:
            ids, nw, nt = [], [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                words = (t or "").strip().lower().split()
                total = 0
                for w in words:
                    c = cache.get(w)
                    if c is None:
                        c = encode_word(w, ranks)
                        cache[w] = c
                    total += c
                ids.append(int(i))
                nw.append(len(words))
                nt.append(total)
            import pandas as pd  # noqa: PLC0415

            yield pd.DataFrame(
                {id_col: ids, "n_words": nw, "n_bpe_tokens": nt}
            )

    return df.select(id_col, text_col).mapInPandas(batches, schema)
