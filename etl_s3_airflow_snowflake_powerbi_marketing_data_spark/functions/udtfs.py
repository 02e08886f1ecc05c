"""Python UDTFs (user-defined TABLE functions, Spark 4.x) — the
row→table extensibility API.

Everything performance-critical in this repo is JVM-side expressions
(the UDF-is-the-slow-path rule); a UDTF earns its place only where the
output is a genuinely custom per-row EXPANSION with imperative logic —
the one extension point the reference's pandas transforms had for free
and a Spark engine must expose deliberately. Sentence splitting is the
canonical example: one document row yields N ordered sentence rows
under tokenizer-style rules.

Determinism contract for the oracle: the regex uses an EXPLICIT ASCII
whitespace class (``[ \\t\\n\\r\\f\\v]``), not ``\\s`` — Python's
``\\s`` is Unicode-aware on str while DuckDB's RE2 ``\\s`` is ASCII,
so the same pattern text could split differently. Explicit classes
pin both engines to identical behavior; strip/trim use the same
character set.

Scale shape: a UDTF is a Python-worker map operation — no shuffle, no
state, parallel per partition like any projection. Enable
``spark.sql.execution.pythonUDTF.arrow.enabled`` for Arrow-batched
transfer on big corpora.
"""

from __future__ import annotations

_WS = " \t\n\r\f\v"
SENTENCE_SPLIT_PATTERN = r"[.!?]+[ \t\n\r\f\v]+"


def make_split_sentences():
    """Build the SplitSentences UDTF class (deferred import: the
    ``udtf`` decorator needs an active Spark runtime)."""
    import re  # noqa: PLC0415

    from pyspark.sql.functions import udtf  # noqa: PLC0415

    pat = re.compile(SENTENCE_SPLIT_PATTERN)

    @udtf(returnType="sent_index int, sentence string, n_chars int")
    class SplitSentences:
        def eval(self, text):  # noqa: ANN001
            if text is None:
                return
            i = 0
            for part in pat.split(text):
                s = part.strip(_WS)
                if s:
                    yield (i, s, len(s))
                    i += 1

    return SplitSentences


def split_sentences_table(spark, df, text_col: str = "text"):
    """Apply the sentence-splitter UDTF laterally: one output row per
    (input row, sentence), carrying every input column. NULL text rows
    vanish (inner lateral join semantics, matching SQL UNNEST)."""
    name = "split_sentences"
    spark.udtf.register(name, make_split_sentences())
    view = f"__udtf_in_{abs(hash(tuple(df.columns))) % 10**8}"
    df.createOrReplaceTempView(view)
    try:
        # backtick-quote every column (names with spaces/keywords stay
        # valid SQL) and omit the carried list entirely when the input
        # has ONLY the text column — 'SELECT , s.*' is a syntax error
        def q(c: str) -> str:
            return "`" + c.replace("`", "``") + "`"

        carried = [f"d.{q(c)}" for c in df.columns if c != text_col]
        select_list = ", ".join([*carried, "s.*"])
        return spark.sql(
            f"SELECT {select_list} FROM {view} d, "
            f"LATERAL {name}(d.{q(text_col)}) s"
        )
    finally:
        spark.catalog.dropTempView(view)
