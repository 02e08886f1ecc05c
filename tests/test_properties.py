"""Property-based tests (hypothesis) for the order-sensitive and
semantic-heavy operators: surrogate keys vs a reference row_number,
merge semantics vs a dict model, connected components vs union-find."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.operators import (
    dedup,
    keys,
    merge,
)

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    ks=st.lists(
        st.integers(min_value=-(10**12), max_value=10**12),
        min_size=1,
        max_size=300,
        unique=True,
    ),
    desc=st.booleans(),
)
@SETTINGS
def test_ordered_surrogate_key_is_row_number(spark, ks, desc):
    df = spark.createDataFrame([(k,) for k in ks], "k long")
    out = keys.ordered_surrogate_key(
        df, "guid", order_by=["k"], descending=desc
    ).collect()
    ranked = sorted(ks, reverse=desc)
    expect = {k: i + 1 for i, k in enumerate(ranked)}
    assert {r["k"]: r["guid"] for r in out} == expect


@given(
    tgt=st.dictionaries(
        st.integers(0, 40), st.integers(-100, 100), min_size=0, max_size=25
    ),
    src=st.dictionaries(
        st.integers(0, 40), st.integers(-100, 100), min_size=0, max_size=25
    ),
)
@SETTINGS
def test_merge_semantics_match_dict_model(spark, tgt, src):
    schema = "k long, v long"
    target = spark.createDataFrame(list(tgt.items()) or [], schema)
    source = spark.createDataFrame(list(src.items()) or [], schema)

    ignore = {r["k"]: r["v"] for r in merge.merge_ignore(target, source, ["k"]).collect()}
    update = {r["k"]: r["v"] for r in merge.merge_update(target, source, ["k"]).collect()}

    model_ignore = {**src, **tgt}   # target wins on conflict
    model_update = {**tgt, **src}   # source wins on conflict
    assert ignore == model_ignore
    assert update == model_update


def _union_find_components(edges):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=1,
        max_size=40,
    ).map(lambda es: [(a, b) for a, b in es if a != b])
)
@SETTINGS
def test_connected_components_match_union_find(spark, edges):
    if not edges:
        return
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r["id"]: r["component"]
        for r in dedup.connected_components(df).collect()
    }
    assert got == _union_find_components(edges)


@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from("ab cd"),
            min_size=0,
            max_size=40,
        ),
        min_size=1,
        max_size=12,
    )
)
@SETTINGS
def test_jaccard_pairs_sound(spark, texts):
    """Every emitted pair's jaccard must be ≥ threshold and the pair
    ids must be ordered — soundness of the prefix-filter fast path."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = dedup.ngram_jaccard_pairs(df, threshold=0.5).collect()
    for r in out:
        assert r["id_a"] < r["id_b"]
        assert r["jaccard"] >= 0.5


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["aa bb", "cc dd", "ee ff", "gg hh", "ii jj"]),
            min_size=1,
            max_size=5,
        ),
        min_size=1,
        max_size=8,
    )
)
@SETTINGS
def test_line_dedup_matches_set_model(spark, docs):
    """Global invariants vs a pure-Python first-occurrence model:
    total kept == number of distinct lines corpus-wide, and each doc's
    kept set is exactly its globally-first occurrences."""
    from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.operators import (
        lines,
    )

    rows = [(i, ls) for i, ls in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, lines array<string>")
    out = {r["doc_id"]: r for r in lines.line_dedup_stats(df).collect()}

    seen: set[str] = set()
    expect_kept: dict[int, int] = {}
    for i, ls in rows:
        kept = 0
        for line in ls:
            if line not in seen:
                seen.add(line)
                kept += 1
        expect_kept[i] = kept

    assert sum(r["n_kept"] for r in out.values()) == len(seen)
    for i, ls in rows:
        assert out[i]["n_lines"] == len(ls)
        assert out[i]["n_kept"] == expect_kept[i]


@given(
    names=st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=6),
        min_size=1,
        max_size=30,
    ),
    blocks=st.integers(min_value=1, max_value=3),
)
@SETTINGS
def test_fuzzy_matches_equal_bruteforce(spark, names, blocks):
    """The distinct-value fuzzy formulation (levenshtein once per
    distinct name pair, expansion back to id pairs) must be
    row-identical to the naive record-pair model — including exact
    duplicate records (distance 0), id-canonical ordering, and names
    aligned to their ids. The tiny 'ab ' alphabet forces heavy
    duplicate and near-duplicate collisions."""
    import re

    rows = [(i, n, f"B{i % blocks}") for i, n in enumerate(names)]
    df = spark.createDataFrame(rows, "rid long, name string, blk string")
    got = {
        (r.id_a, r.id_b, r.name_a, r.name_b, r.distance)
        for r in dedup.fuzzy_string_matches(
            df, "name", "rid", "blk", max_distance=1
        ).collect()
    }

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    def norm(t):
        return re.sub(r"\s+", " ", t.strip().lower())

    want = set()
    for i, (ia, na, ba) in enumerate(rows):
        for ib, nb, bb in rows[i + 1:]:
            if ba != bb:
                continue
            d = lev(norm(na), norm(nb))
            if d <= 1:
                want.add((ia, ib, norm(na), norm(nb), d))
    assert got == want
