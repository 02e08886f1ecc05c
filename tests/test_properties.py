"""Property-based tests (hypothesis) for the order-sensitive and
semantic-heavy operators: surrogate keys vs a reference row_number,
merge semantics vs a dict model, connected components vs union-find."""

from __future__ import annotations

import math

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


@given(
    srcs=st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff", "gg"]),
            min_size=1,
            max_size=12,
        ),
        min_size=2,
        max_size=3,
    ),
)
@SETTINGS
def test_kmv_overlap_exact_when_k_covers_union(spark, srcs):
    """With k >= |union| the KMV sketch IS the union, so every pair's
    estimate must equal the exact Jaccard of the unigram-shingle sets
    (floor-truncated), and n_union/n_common must be the exact set
    sizes."""
    from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.operators import (
        sketches,
    )

    rows = [
        (i, " ".join(words), f"s{i}")
        for i, words in enumerate(srcs)
    ]
    sets = {f"s{i}": set(words) for i, words in enumerate(srcs)}
    out = sketches.kmv_source_overlap(
        spark.createDataFrame(
            rows, "doc_id long, text string, source string"
        ),
        n=1,
        k=64,
    ).collect()
    assert len(out) == len(srcs) * (len(srcs) - 1) // 2
    import math

    for r in out:
        a, b = sets[r["source_a"]], sets[r["source_b"]]
        union, common = len(a | b), len(a & b)
        assert r["n_union_sketch"] == union
        assert r["n_common"] == common
        assert r["jaccard_est"] == math.floor(common / union * 1e6) / 1e6


@given(
    text=st.lists(
        st.sampled_from(["x", "y", "z", "w"]), min_size=1, max_size=20
    ),
    other=st.lists(
        st.sampled_from(["x", "y", "z", "w"]), min_size=1, max_size=20
    ),
)
@SETTINGS
def test_source_divergence_bounds_and_identity(spark, text, other):
    """JSD is bounded by [0, ln 2]; identical sources score exactly
    0.0 (every shared term has pa == pb so each log is ln 1)."""
    from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.functions import (
        text as text_fn,
    )

    t1, t2 = " ".join(text), " ".join(other)
    df = spark.createDataFrame(
        [(1, t1, "A"), (2, t2, "B"), (3, t1, "C")],
        "doc_id long, text string, source string",
    )
    out = {
        (r["source_a"], r["source_b"]): r["js_divergence"]
        for r in text_fn.source_unigram_divergence(df).collect()
    }
    assert out[("A", "C")] == 0.0
    for v in out.values():
        assert 0.0 <= v <= 0.693148


@given(
    obs=st.dictionaries(
        st.integers(min_value=0, max_value=40),
        st.floats(
            min_value=-1e6, max_value=1e6,
            allow_nan=False, allow_infinity=False,
        ),
        min_size=1,
        max_size=12,
    ),
)
@SETTINGS
def test_interpolate_daily_matches_python_model(spark, obs):
    """Every output day matches the exact Python mirror of the
    interpolation formula; observed days pass through bit-unchanged."""
    import math
    from datetime import datetime, timedelta

    from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.operators import (
        timeseries,
    )

    base = datetime(2024, 1, 1)
    rows = [
        ("k", base + timedelta(days=d), v) for d, v in sorted(obs.items())
    ]
    out = {
        (r["day"] - base).days: (r["v"], r["is_interpolated"])
        for r in timeseries.interpolate_daily(
            spark.createDataFrame(rows, "k string, day timestamp, v double"),
            "k",
            "day",
            "v",
        ).collect()
    }
    days = sorted(obs)
    assert set(out) == set(range(days[0], days[-1] + 1))
    for d in range(days[0], days[-1] + 1):
        if d in obs:
            assert out[d] == (obs[d], False)
        else:
            p = max(x for x in days if x < d)
            n = min(x for x in days if x > d)
            expect = obs[p] + (obs[n] - obs[p]) * ((d - p) / (n - p))
            assert out[d] == (math.floor(expect * 1e6) / 1e6, True)


@given(
    stream=st.lists(
        st.integers(min_value=0, max_value=30),
        min_size=1,
        max_size=400,
    ),
    phi_pct=st.integers(min_value=2, max_value=30),
)
@SETTINGS
def test_heavy_hitters_equal_exact_filter(spark, stream, phi_pct):
    from collections import Counter

    from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.operators import (
        heavyhitters,
    )

    phi = phi_pct / 100.0
    df = spark.createDataFrame([(f"k{v}",) for v in stream], "k string")
    got = {
        r.k: r.n_occurrences
        for r in heavyhitters.heavy_hitters(df, "k", phi=phi).collect()
    }
    c = Counter(f"k{v}" for v in stream)
    n = len(stream)
    expect = {k: v for k, v in c.items() if v / n >= phi}
    assert got == expect


@given(
    a=st.lists(
        st.integers(min_value=-50, max_value=50), min_size=1, max_size=120
    ),
    b=st.lists(
        st.integers(min_value=-50, max_value=50), min_size=1, max_size=120
    ),
)
@SETTINGS
def test_ks_two_sample_matches_ecdf_model(spark, a, b):
    from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.operators import (
        stats,
    )

    rows = [(float(v), "a") for v in a] + [(float(v), "b") for v in b]
    row = stats.ks_two_sample(
        spark.createDataFrame(rows, "v double, g string"), "v", "g", "a", "b"
    ).collect()[0]
    # raw-double comparison, NO epsilon guard: the operator (and its
    # SQL oracle) order by the exact IEEE diff, where e.g. |1 - 2/3|
    # and |0 - 1/3| differ by one ulp — the model must mirror that
    xs = sorted(set(a) | set(b))
    best, at = -1.0, None
    for x in xs:
        d = abs(
            sum(1 for v in a if v <= x) / len(a)
            - sum(1 for v in b if v <= x) / len(b)
        )
        if d > best:
            best, at = d, float(x)
    assert row.at_value == at
    assert row.ks_stat == math.floor(best * 1e6) / 1e6


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)),
        min_size=1,
        max_size=60,
    )
)
@SETTINGS
def test_triangle_count_matches_bruteforce(spark, edges):
    import itertools

    from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.operators import (
        graph,
    )

    simple = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    if not simple:
        return
    row = graph.triangle_count(
        spark.createDataFrame(list(edges), "src long, dst long")
    ).collect()[0]
    nodes = sorted({n for e in simple for n in e})
    brute = sum(
        1
        for x, y, z in itertools.combinations(nodes, 3)
        if (x, y) in simple and (y, z) in simple and (x, z) in simple
    )
    deg = {n: sum(1 for e in simple if n in e) for n in nodes}
    assert row.n_triangles == brute
    assert row.n_edges == len(simple)
    assert row.n_wedges == sum(d * (d - 1) // 2 for d in deg.values())


@given(
    weights=st.lists(
        st.integers(min_value=1, max_value=10**6), min_size=1, max_size=150
    ),
    k=st.integers(min_value=1, max_value=40),
)
@SETTINGS
def test_weighted_fixed_k_matches_aes_model(spark, weights, k):
    import hashlib

    from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.operators import (
        sampling,
    )

    rows = [(i, w) for i, w in enumerate(weights)]
    got = sorted(
        r.id
        for r in sampling.weighted_fixed_k_sample(
            spark.createDataFrame(rows, "id long, w long"), "id", "w", k=k
        ).collect()
    )

    def key(i, w):
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
        return math.floor(math.log((h + 1) / 2**60) / w * 1e12) / 1e12

    expect = sorted(
        i for i, _ in sorted(rows, key=lambda r: (-key(*r), r[0]))[:k]
    )
    assert got == expect


@given(
    lefts=st.lists(
        st.tuples(
            st.integers(0, 3),  # key
            st.integers(0, 10_000),  # time (seconds)
        ),
        min_size=1,
        max_size=40,
    ),
    rights=st.lists(
        st.tuples(
            st.integers(0, 3),
            st.integers(0, 10_000),
            st.integers(-100, 100),  # payload
        ),
        min_size=0,
        max_size=40,
    ),
    direction=st.sampled_from(["backward", "forward"]),
    tol_s=st.one_of(st.none(), st.integers(1, 5_000)),
)
@SETTINGS
def test_asof_join_matches_python_model(spark, lefts, rights, direction, tol_s):
    """asof_join == the obvious per-row scan: for each left row, the
    right row with the same key and the max time <= left time
    (backward) / min time >= left time (forward), nulled beyond the
    tolerance. Right rows are deduped per (key, time) keeping the max
    payload so the pick is deterministic on both sides."""
    from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.operators import (
        asof,
    )

    base = 1_700_000_000  # epoch seconds → timestamps

    best = {}
    for k, t, p in rights:
        best[(k, t)] = max(p, best.get((k, t), p))
    r_rows = [(k, t, p) for (k, t), p in sorted(best.items())]

    left = spark.createDataFrame(
        [(i, k, base + t) for i, (k, t) in enumerate(lefts)],
        "lid long, k long, lt long",
    ).withColumn("lt", F.col("lt").cast("timestamp"))
    right = spark.createDataFrame(
        [(k, base + t, p) for k, t, p in r_rows] or [],
        "k long, rt long, payload long",
    ).withColumn("rt", F.col("rt").cast("timestamp"))

    out = asof.asof_join(
        left,
        right,
        on="k",
        left_time="lt",
        right_time="rt",
        right_cols=["payload"],
        direction=direction,
        tolerance=f"{tol_s} seconds" if tol_s is not None else None,
    ).collect()

    def model(k, t):
        cand = [
            (rt, p)
            for (rk, rt), p in best.items()
            if rk == k and (rt <= t if direction == "backward" else rt >= t)
        ]
        if not cand:
            return None
        rt, p = max(cand) if direction == "backward" else min(cand)
        if tol_s is not None and abs(t - rt) > tol_s:
            return None
        return p

    got = {r["lid"]: r["payload"] for r in out}
    want = {i: model(k, t) for i, (k, t) in enumerate(lefts)}
    assert got == want


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["A", "B", "C"]),
            st.integers(0, 100),  # score percent
            st.integers(1, 50),  # weight
        ),
        min_size=1,
        max_size=60,
    ),
    bf_pct=st.integers(10, 100),
)
@SETTINGS
def test_mixture_budget_select_matches_python_model(spark, rows, bf_pct):
    """mixture_budget_select == the obvious per-group sorted cumsum:
    global budget floor(total·bf), per-group floor(global·prop), rows
    taken in (score DESC, id ASC) while the group cumsum stays within
    its budget."""
    from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.operators import (
        sampling,
    )

    props = {"A": 0.5, "B": 0.25}
    bf = bf_pct / 100.0
    data = [
        (i, g, s / 100.0, w) for i, (g, s, w) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "id long, g string, score double, w long"
    )
    out = sampling.mixture_budget_select(
        df, "id", "score", "w", "g", proportions=props, budget_fraction=bf
    ).collect()

    total = sum(w for _, _, _, w in data)
    glob = math.floor(total * bf)
    want = {}
    for g in {"A", "B", "C"}:
        budget = math.floor(float(glob) * props.get(g, 0.0))
        cum = 0
        for i, _, s, w in sorted(
            (r for r in data if r[1] == g), key=lambda r: (-r[2], r[0])
        ):
            cum += w
            if cum <= budget:
                want[i] = cum
    got = {r["id"]: r["cum_w"] for r in out}
    assert got == want


def test_source_temperature_mix_flattens_toward_uniform(spark):
    """alpha < 1 compresses size disparities: the weight ratio between
    the largest and smallest source must be strictly smaller than
    their raw size ratio, weights must sum to ~1, and alpha=1 must
    reproduce raw proportions (to truncation)."""
    from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.operators import (
        sampling,
    )

    rows = (
        [(i, "a", 100) for i in range(8)]
        + [(100 + i, "b", 400) for i in range(4)]
        + [(200 + i, "c", 50) for i in range(2)]
    )
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_chars"])
    out = {
        r["source"]: r
        for r in sampling.source_temperature_mix(df, alpha=0.7).collect()
    }
    sizes = {s: out[s]["n_bytes"] for s in out}
    big, small = max(sizes, key=sizes.get), min(sizes, key=sizes.get)
    assert sum(r["weight"] for r in out.values()) > 0.999
    assert (
        out[big]["weight"] / out[small]["weight"]
        < sizes[big] / sizes[small]
    )
    # allocation follows floor(weight * budget)
    for r in out.values():
        assert r["alloc_docs"] == int(r["weight"] * 1000 + 1e-9)
    flat = {
        r["source"]: r["weight"]
        for r in sampling.source_temperature_mix(df, alpha=1.0).collect()
    }
    total = sum(sizes.values())
    for s, w in flat.items():
        assert abs(w - sizes[s] / total) < 2e-6


@given(
    sizes=st.lists(
        st.integers(min_value=1, max_value=14), min_size=1, max_size=5
    ),
)
@SETTINGS
def test_interleave_order_matches_stride_model_and_prefix_share(
    spark, sizes
):
    """source_interleave_order at the API boundary (VERDICT r07 item
    7). Two properties:

    1. EXACT stride model: the ordered (interleave_key, source,
       src_rank) sequence equals the pure-Python stride schedule —
       doc i of an m-doc source at key (2i−1)·scale div (2m), epoch
       sorted by (key, source, rank). (Which document holds a given
       rank is hash-assigned and not part of the contract.)
    2. Proportional prefixes — the docstring's guarantee, quantified:
       every prefix of length L holds each source within ±1 document
       of its proportional share L·m/M after rounding (deviation
       strictly < 2; stride scheduling does NOT promise a strict ±1
       against the unrounded fluid share — sims find deviations up to
       ~1.3 — so <2 is the honest bound).
    """
    from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.operators import (
        sampling,
    )

    scale = 1_048_576
    rows = []
    doc_id = 0
    for j, m in enumerate(sizes):
        for _ in range(m):
            rows.append((doc_id, f"s{j}"))
            doc_id += 1
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    got = [
        (r["interleave_key"], r["source"], r["src_rank"])
        for r in sampling.source_interleave_order(df).collect()
    ]
    model = sorted(
        ((2 * i - 1) * scale // (2 * m), f"s{j}", i)
        for j, m in enumerate(sizes)
        for i in range(1, m + 1)
    )
    assert got == model
    total = sum(sizes)
    seen = dict.fromkeys((f"s{j}" for j in range(len(sizes))), 0)
    for pos, (_k, src, _i) in enumerate(got, 1):
        seen[src] += 1
        for j, m in enumerate(sizes):
            assert abs(seen[f"s{j}"] - pos * m / total) < 2


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["spark", "hash", "join", "scan", "sort", "x"]),
            min_size=1,
            max_size=12,
        ),
        min_size=1,
        max_size=15,
    ),
)
@SETTINGS
def test_bm25_matches_naive_python_model(spark, docs):
    """Differential oracle: bm25_topk against a from-scratch pure-Python
    BM25 replica (same trunc6/decimal discipline) on random corpora —
    scores, ranks, and membership all agree."""
    import math

    from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.functions import (
        text as text_fn,
    )

    terms = ["spark", "join"]
    k1, b = 1.2, 0.75
    texts = [" ".join(ws) for ws in docs]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = text_fn.bm25_topk(df, terms, top_k=5).collect()

    def t6(x: float) -> float:
        return math.floor(x * 1e6) / 1e6

    n = len(texts)
    dl = {i: len(t.split()) for i, t in enumerate(texts)}
    avgdl = sum(dl.values()) / n
    scores = {}
    for q in terms:
        dft = sum(1 for t in texts if q in t.split())
        idf = t6(math.log(1.0 + (n - dft + 0.5) / (dft + 0.5)))
        for i, t in enumerate(texts):
            tf = t.split().count(q)
            if tf == 0:
                continue
            c = t6(
                idf * (tf * (k1 + 1.0))
                / (tf + k1 * (1.0 - b + (b * dl[i]) / avgdl))
            )
            # DECIMAL-exact accumulation on the 1e-6 grid
            scores[i] = scores.get(i, 0) + round(c * 1e6)
    expect = sorted(
        ((s, i) for i, s in scores.items()), key=lambda p: (-p[0], p[1])
    )[:5]
    assert [(r["doc_id"], round(r["score"] * 1e6)) for r in got] == [
        (i, s) for s, i in expect
    ]
    assert [r["rank"] for r in got] == list(range(1, len(expect) + 1))


@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["A", "B", "C"]),
            st.lists(
                st.sampled_from(["a", "b", "c", "d"]),
                min_size=1,
                max_size=8,
            ),
        ),
        min_size=1,
        max_size=12,
    ),
    n=st.sampled_from([2, 3]),
)
@SETTINGS
def test_cross_source_ngram_matrix_matches_set_model(spark, docs, n):
    """Differential oracle: the matrix equals per-source shingle-set
    intersections computed by a from-scratch Python model (including
    the short-doc full-join fallback of word_shingles)."""
    from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.operators import (
        dedup,
    )

    rows = [(i, " ".join(ws), src) for i, (src, ws) in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    got = {
        (r["source_a"], r["source_b"]): r["shared_ngrams"]
        for r in dedup.cross_source_ngram_matrix(df, n=n).collect()
    }

    def shingles(ws: list[str]) -> set[str]:
        if len(ws) < n:
            return {" ".join(ws)}
        return {" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)}

    per_src: dict[str, set[str]] = {}
    for src, ws in docs:
        per_src.setdefault(src, set()).update(shingles(ws))
    srcs = sorted(per_src)
    expect = {}
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            k = len(per_src[a] & per_src[b])
            if k:
                expect[(a, b)] = k
    assert got == expect


@given(
    docs=st.lists(
        st.tuples(
            st.booleans(),
            st.lists(
                st.sampled_from(["a", "b", "c", "d", "e"]),
                min_size=0,
                max_size=10,
            ),
        ),
        min_size=1,
        max_size=14,
    ),
)
@SETTINGS
def test_nb_log_odds_matches_python_model(spark, docs):
    """Differential oracle: nb_class_log_odds against a from-scratch
    pure-Python multinomial NB (same trunc6 floats, same Laplace
    smoothing, same decimal-grid accumulation) on random labeled
    corpora — token counts, scores, and labels all agree, including
    empty documents and single-class corpora."""
    from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.functions import (
        text as text_fn,
    )

    rows = [(i, flag, " ".join(ws)) for i, (flag, ws) in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "is_tgt", "text"])
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            round(r["mean_log_odds"] * 1e6),
            r["nb_label"],
        )
        for r in text_fn.nb_class_log_odds(df, F.col("is_tgt")).collect()
    }

    per_dt: dict[tuple[int, str], int] = {}
    for i, (flag, ws) in enumerate(docs):
        for w in ws:
            per_dt[(i, w)] = per_dt.get((i, w), 0) + 1
    ct: dict[str, int] = {}
    co: dict[str, int] = {}
    for (i, w), c in per_dt.items():
        if docs[i][0]:
            ct[w] = ct.get(w, 0) + c
        else:
            co[w] = co.get(w, 0) + c
    vocab = sorted({w for _i, w in per_dt})
    nt, no, v = sum(ct.values()), sum(co.values()), len(vocab)
    s_micro = {
        w: math.floor(math.log((ct.get(w, 0) + 1) / (nt + v)) * 1e6)
        - math.floor(math.log((co.get(w, 0) + 1) / (no + v)) * 1e6)
        for w in vocab
    }
    for i, (_flag, ws) in enumerate(docs):
        n = len(ws)
        if n == 0:
            assert got[i] == (0, 0, "other")
            continue
        micros = sum(s_micro[w] * per_dt[(i, w)] for w in set(ws))
        mean_micro = math.floor((micros / 1e6) / n * 1e6)
        label = "target" if mean_micro / 1e6 > 0.0 else "other"
        assert got[i] == (n, mean_micro, label)


@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["tgt0", "tgt1", "raw0", "raw1"]),
            st.lists(
                st.sampled_from(["a", "b", "c", "d", "e", "f"]),
                min_size=0,
                max_size=10,
            ),
        ),
        min_size=1,
        max_size=14,
    ),
)
@SETTINGS
def test_importance_resample_matches_python_model(spark, docs):
    """Differential oracle: importance_resample against a from-scratch
    DSIR replica (hashlib md5 buckets, same trunc6/decimal-grid math,
    same (-weight, doc_id) tie-break) on random multi-source corpora."""
    import hashlib

    from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.operators import (
        sampling,
    )

    dim, k = 16, 5
    rows = [(i, src, " ".join(ws)) for i, (src, ws) in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    target = F.col("source").isin("tgt0", "tgt1")
    got = [
        (r["doc_id"], r["n_tokens"], round(r["log_weight"] * 1e6))
        for r in sampling.importance_resample(
            df, target, k=k, dim=dim
        ).collect()
    ]

    def bucket(w: str) -> int:
        return int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % dim

    per_db: dict[tuple[int, int], int] = {}
    for i, (_src, ws) in enumerate(docs):
        for w in ws:
            b = bucket(w)
            per_db[(i, b)] = per_db.get((i, b), 0) + 1
    ct: dict[int, int] = {}
    cr: dict[int, int] = {}
    for (i, b), c in per_db.items():
        cr[b] = cr.get(b, 0) + c
        if docs[i][0].startswith("tgt"):
            ct[b] = ct.get(b, 0) + c
    nt, nr = sum(ct.values()), sum(cr.values())
    s_micro = {
        b: math.floor(math.log((ct.get(b, 0) + 1) / (nt + dim)) * 1e6)
        - math.floor(math.log((cr[b] + 1) / (nr + dim)) * 1e6)
        for b in cr
    }
    expect = []
    for i, (src, ws) in enumerate(docs):
        if src.startswith("tgt"):
            continue
        n = len(ws)
        if n == 0:
            # zero-token documents are EXCLUDED from the ranked
            # selection (ADVICE r08: an empty doc's coalesced 0.0
            # outranked every negatively-scored real document)
            continue
        micros = sum(
            s_micro[b] * c for (j, b), c in per_db.items() if j == i
        )
        mean_micro = math.floor((micros / 1e6) / n * 1e6)
        expect.append((mean_micro, n, i))
    expect.sort(key=lambda p: (-p[0], p[2]))
    assert got == [(i, n, m) for m, n, i in expect[:k]]


@given(
    docs=st.lists(
        st.tuples(
            st.booleans(),
            st.sampled_from(
                ["a a a b", "z z y x", "a b a b", "q", "", "a a a b"]
            ),
        ),
        min_size=1,
        max_size=12,
    ),
)
@SETTINGS
def test_curation_funnel_composes_its_stages(spark, docs):
    """curation_funnel equals the composition of its independently
    tested stages: gopher flags → NB score > 0 → keep-first exact
    dedup among classifier survivors, with stage counts computed by a
    Python fold over the two component operators' own outputs."""
    from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.functions import (
        text as text_fn,
    )

    rows = [(i, flag, t) for i, (flag, t) in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "is_tgt", "text"])
    got = {
        r["stage"]: (r["n_docs"], r["n_tokens"])
        for r in text_fn.curation_funnel(
            df, F.col("is_tgt"), min_words=2
        ).collect()
    }

    gop = {
        r["doc_id"]: (r["n_words"], r["keep"])
        for r in text_fn.gopher_quality_flags(df, min_words=2).collect()
    }
    nb = {
        r["doc_id"]: r["mean_log_odds"]
        for r in text_fn.nb_class_log_odds(df, F.col("is_tgt")).collect()
    }
    g_ids = [i for i, _f in enumerate(docs) if gop[i][1]]
    c_ids = [i for i in g_ids if nb[i] > 0.0]
    first_by_text: dict[str, int] = {}
    for i in c_ids:
        first_by_text.setdefault(docs[i][1], i)
    d_ids = [i for i in c_ids if first_by_text[docs[i][1]] == i]

    def stage(ids):
        return (len(ids), sum(gop[i][0] for i in ids))

    assert got == {
        "0_total": stage(range(len(docs))),
        "1_gopher": stage(g_ids),
        "2_classifier": stage(c_ids),
        "3_dedup": stage(d_ids),
    }


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c"]),
            min_size=0,
            max_size=10,
        ),
        min_size=1,
        max_size=10,
    ),
    min_occ=st.sampled_from([2, 3]),
)
@SETTINGS
def test_substring_dedup_matches_python_model(spark, docs, min_occ):
    """Differential oracle: dedup_exact_substrings against a
    from-scratch Python ExactSubstr replica (n-gram occurrence counts
    over full windows, covered-position union, order-preserving
    rebuild) on random corpora — small alphabet guarantees repeated
    grams, short docs exercise the no-window pass-through."""
    n = 3
    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["cleaned_text"])
        for r in dedup.dedup_exact_substrings(
            df, n=n, min_occurrences=min_occ
        ).collect()
    }

    counts: dict[tuple[str, ...], int] = {}
    for ws in docs:
        for s in range(len(ws) - n + 1):
            g = tuple(ws[s : s + n])
            counts[g] = counts.get(g, 0) + 1
    expect = {}
    for i, ws in enumerate(docs):
        covered: set[int] = set()
        for s in range(len(ws) - n + 1):
            if counts[tuple(ws[s : s + n])] >= min_occ:
                covered.update(range(s, s + n))
        kept = [w for p, w in enumerate(ws) if p not in covered]
        expect[i] = (len(ws), len(covered), " ".join(kept))
    assert got == expect


@given(
    train=st.lists(
        st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=10),
        min_size=1,
        max_size=8,
    ),
    ev=st.lists(
        st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=10),
        min_size=1,
        max_size=4,
    ),
)
@SETTINGS
def test_decontaminate_rewrite_matches_python_model(spark, train, ev):
    """Differential oracle: decontaminate_rewrite against a
    from-scratch Python replica (eval n-gram set → covered-position
    union over train windows → order-preserving rebuild)."""
    from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.operators import (
        decontam,
    )

    n = 3
    train_df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(train)],
        ["doc_id", "text"],
    )
    ev_df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(ev)], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["cleaned_text"])
        for r in decontam.decontaminate_rewrite(train_df, ev_df, n=n).collect()
    }

    ev_grams = {
        tuple(ws[s : s + n])
        for ws in ev
        for s in range(len(ws) - n + 1)
    }
    expect = {}
    for i, ws in enumerate(train):
        covered: set[int] = set()
        for s in range(len(ws) - n + 1):
            if tuple(ws[s : s + n]) in ev_grams:
                covered.update(range(s, s + n))
        kept = [w for p, w in enumerate(ws) if p not in covered]
        expect[i] = (len(ws), len(covered), " ".join(kept))
    assert got == expect


@given(
    docs=st.lists(
        st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=12),
        min_size=1,
        max_size=8,
    ),
    pick=st.data(),
)
@SETTINGS
def test_excise_covered_matches_position_model(spark, docs, pick):
    """Differential oracle for the SHARED span algebra itself
    (operators/dedup.py:_excise_covered), independent of how callers
    detect windows: flagged (id, start) sets are drawn ARBITRARILY
    from each doc's valid window starts — overlapping spans, adjacent
    spans, the boundary window at len-n, full coverage (empty rebuilt
    text), and shorter-than-n docs (no valid start → the map-only
    clean branch) all arise — and the output must equal a brute-force
    covered-position-set model (VERDICT r08 item 7)."""
    from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.operators.dedup import (
        _excise_covered,
        _tokenized_base,
    )

    n = 3
    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    flagged_rows = []
    flagged_model: dict[int, list[int]] = {}
    for i, ws in enumerate(docs):
        valid = list(range(max(len(ws) - n + 1, 0)))
        starts = pick.draw(
            st.lists(st.sampled_from(valid), unique=True, max_size=6)
            if valid
            else st.just([])
        )
        flagged_model[i] = starts
        flagged_rows.extend((i, s) for s in starts)
    base = _tokenized_base(df, "text", "doc_id")
    flagged = spark.createDataFrame(
        flagged_rows or [(None, None)], "id long, start int"
    )
    if not flagged_rows:
        flagged = flagged.filter(F.col("id").isNotNull())
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["cleaned_text"])
        for r in _excise_covered(base, flagged, n, "doc_id").collect()
    }

    expect = {}
    for i, ws in enumerate(docs):
        covered: set[int] = set()
        for s in flagged_model[i]:
            covered.update(range(s, s + n))
        kept = [w for p, w in enumerate(ws) if p not in covered]
        expect[i] = (len(ws), len(covered), " ".join(kept))
    assert got == expect


# --- round 10: codec round-trip properties (pure Python, no Spark) ---
# The committed encoders/decoders are the trust anchors for every
# image/audio dedup oracle, so they get property coverage beyond the
# fixture shapes: arbitrary grids, filters, palettes, waveforms.

_px = st.tuples(
    st.integers(0, 255), st.integers(0, 255), st.integers(0, 255)
)


def _grid(w_max=10, h_max=8, colors=None):
    cell = st.sampled_from(colors) if colors else _px
    return st.integers(1, w_max).flatmap(
        lambda w: st.lists(
            st.lists(cell, min_size=w, max_size=w),
            min_size=1,
            max_size=h_max,
        )
    )


@given(
    rows=_grid(),
    flt=st.lists(st.integers(0, 4), min_size=1, max_size=6),
    alpha=st.booleans(),
)
@SETTINGS
def test_png_roundtrip_property(rows, flt, alpha):
    from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.functions import (
        multimodal as mm,
    )

    payload = mm.encode_png_pixels(rows, filters=flt, alpha=alpha)
    assert mm._png_pixels(payload) == rows
    assert mm.decode_image(payload) == (len(rows[0]), len(rows))


@given(
    rows=_grid(colors=[(0, 0, 0), (255, 255, 255), (17, 51, 119),
                       (250, 2, 4), (9, 200, 90)]),
    interlace=st.booleans(),
)
@SETTINGS
def test_gif_roundtrip_property(rows, interlace):
    from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.functions import (
        multimodal as mm,
    )

    payload = mm.encode_gif_pixels(rows, interlace=interlace)
    assert mm._gif_pixels(payload) == rows
    assert mm.decode_image(payload) == (len(rows[0]), len(rows))


@given(
    samples=st.lists(
        st.integers(-32768, 32767), min_size=1, max_size=400
    ),
    sr=st.sampled_from([8000, 16000, 44100]),
)
@SETTINGS
def test_wav_samples_roundtrip_and_fingerprint_property(samples, sr):
    from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.functions import (
        multimodal as mm,
    )

    payload = mm.encode_wav_samples(samples, sr)
    assert mm._wav_samples(payload) == samples
    # independent fingerprint re-derivation (same documented spec,
    # re-implemented here from scratch)
    n = len(samples)
    energies = []
    for i in range(65):
        lo = i * n // 65
        hi = min(max((i + 1) * n // 65, lo + 1), n)
        energies.append(sum(s * s for s in samples[lo:hi]))
    bits = 0
    for i in range(64):
        if energies[i + 1] > energies[i]:
            bits |= 1 << i
    expect = bits - (1 << 64) if bits >= (1 << 63) else bits
    assert mm.audio_fingerprint(payload) == expect


@given(
    rows=_grid(w_max=12, h_max=10),
    quality=st.sampled_from([60, 80, 90, 100]),
    gray=st.booleans(),
    sub=st.sampled_from(["444", "420", "422"]),
)
@SETTINGS
def test_jpeg_roundtrip_matches_codec_math_property(
    rows, quality, gray, sub
):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from tools import gen_expected as ge
    from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.functions import (
        multimodal as mm,
    )

    payload = mm.encode_jpeg_pixels(
        rows, quality=quality, grayscale=gray, subsampling=sub
    )
    dec = mm._jpeg_pixels(payload)
    assert dec == ge._jpeg_decoded_replica(
        rows, quality, grayscale=gray, subsampling=sub
    )
    assert mm.decode_image(payload) == (len(rows[0]), len(rows))


@given(
    rows=_grid(w_max=12, h_max=10),
    quality=st.sampled_from([60, 80, 90, 100]),
    gray=st.booleans(),
    sub=st.sampled_from(["444", "420", "422"]),
)
@SETTINGS
def test_progressive_jpeg_matches_codec_math_property(
    rows, quality, gray, sub
):
    """Progressive (SOF2) encode transmits the SAME quantized
    coefficients as baseline, so its decode must equal the
    closed-form codec-math replica bit-for-bit on arbitrary grids —
    pinning the spectral-selection + successive-approximation entropy
    round trip (EOB runs, refinement correction bits) as lossless."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from tools import gen_expected as ge
    from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.functions import (
        multimodal as mm,
    )

    payload = mm.encode_jpeg_pixels(
        rows, quality=quality, grayscale=gray, subsampling=sub,
        progressive=True,
    )
    # SOF2 in the header region (after APP0 + DQT), never SOF0
    assert b"\xff\xc2" in payload[:220] and b"\xff\xc0" not in payload[:220]
    dec = mm.decode_image_pixels(payload)
    assert dec == ge._jpeg_decoded_replica(
        rows, quality, grayscale=gray, subsampling=sub
    )
