"""Property tests: connected components vs an independent union-find,
and duplicate-substring spans vs a brute-force Python scan."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from autosinapi_spark.operators.graph import connected_components


def _union_find(n_vertices: list[int], edges: list[tuple[int, int]]):
    parent = {v: v for v in n_vertices}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical min-id per component
    comp = {}
    for v in n_vertices:
        r = find(v)
        comp.setdefault(r, []).append(v)
    return {v: min(members) for r, members in comp.items() for v in members}


def test_cc_matches_union_find_on_random_graphs(spark):
    rng = random.Random(97)
    for trial in range(4):
        n = rng.randint(5, 40)
        verts = list(range(n))
        n_edges = rng.randint(0, n * 2)
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(n_edges)
        ]
        expected = _union_find(verts, edges)

        vdf = spark.createDataFrame([(v,) for v in verts], "id long")
        edf = spark.createDataFrame(
            edges or [(0, 0)], "src long, dst long"
        )
        if not edges:
            edf = edf.where("src < 0")
        got = {
            r["id"]: r["comp"]
            for r in connected_components(vdf, edf).collect()
        }
        assert got == expected, f"trial {trial} (n={n}, e={n_edges})"


def _brute_force_span_coverage(docs: dict[int, list[str]], L: int):
    """Independent definition: token position p of doc d is duplicated
    iff SOME L-window covering p occurs >= 2 times in the corpus."""
    from collections import Counter

    counts = Counter()
    for ts in docs.values():
        for i in range(len(ts) - L + 1):
            counts[tuple(ts[i : i + L])] += 1
    out = {}
    for d, ts in docs.items():
        covered = set()
        for i in range(len(ts) - L + 1):
            if counts[tuple(ts[i : i + L])] >= 2:
                covered.update(range(i, i + L))
        # maximal runs over covered positions
        spans = 0
        prev = None
        for p in sorted(covered):
            if prev is None or p != prev + 1:
                spans += 1
            prev = p
        out[d] = (spans, len(covered))
    return out


def test_substring_spans_match_bruteforce(spark, tmp_path):
    from autosinapi_spark.operators.near_dedup import shingle_grams
    from pyspark.sql.window import Window

    L = 4
    rng = random.Random(13)
    vocab = [f"w{i}" for i in range(12)]
    shared = [rng.choice(vocab) for _ in range(7)]  # planted boilerplate
    docs = {}
    for d in range(12):
        body = [rng.choice(vocab) for _ in range(rng.randint(L, 25))]
        if d % 3 == 0:
            pos = rng.randint(0, len(body))
            body = body[:pos] + shared + body[pos:]
        docs[d] = body
    expected = _brute_force_span_coverage(docs, L)

    df = spark.createDataFrame(
        [(d, " ".join(ts)) for d, ts in docs.items()],
        "doc_id long, text string",
    )
    ts = F.split("text", " ")
    base = df.select("doc_id", ts.alias("ts"), F.size(ts).alias("n"))
    grams = base.where(F.col("n") >= L).select(
        "doc_id", F.posexplode(shingle_grams(F.col("ts"), L)).alias("p0", "g")
    )
    dup = (
        grams.groupBy("g").agg(F.count(F.lit(1)).alias("c")).where("c > 1")
    )
    covered = (
        grams.join(dup, "g")
        .select(
            "doc_id",
            F.explode(F.sequence("p0", F.col("p0") + F.lit(L - 1))).alias(
                "tp"
            ),
        )
        .distinct()
    )
    w = Window.partitionBy("doc_id").orderBy("tp")
    spans = (
        covered.withColumn("run", F.col("tp") - F.row_number().over(w))
        .groupBy("doc_id", "run")
        .count()
    )
    got_spans = {
        r["doc_id"]: r["n"]
        for r in spans.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got_cov = {
        r["doc_id"]: r["n"]
        for r in covered.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for d, (exp_spans, exp_cov) in expected.items():
        assert got_spans.get(d, 0) == exp_spans, f"doc {d} spans"
        assert got_cov.get(d, 0) == exp_cov, f"doc {d} coverage"


def test_star_cc_matches_union_find_on_random_graphs(spark):
    from autosinapi_spark.operators.graph import connected_components_star

    rng = random.Random(41)
    for trial in range(3):
        n = rng.randint(5, 40)
        verts = list(range(n))
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.randint(0, n * 2))
        ]
        expected = _union_find(verts, edges)
        vdf = spark.createDataFrame([(v,) for v in verts], "id long")
        edf = spark.createDataFrame(edges or [(0, 0)], "src long, dst long")
        if not edges:
            edf = edf.where("src < 0")
        got = {
            r["id"]: r["comp"]
            for r in connected_components_star(vdf, edf).collect()
        }
        assert got == expected, f"trial {trial}"


def test_star_cc_handles_long_path(spark):
    """A 120-vertex path: min-label needs ~120 rounds (> max_iter);
    the star variant converges in O(log n)."""
    from autosinapi_spark.operators.graph import connected_components_star

    n = 120
    vdf = spark.createDataFrame([(v,) for v in range(n)], "id long")
    edf = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    got = {
        r["id"]: r["comp"]
        for r in connected_components_star(vdf, edf).collect()
    }
    assert got == {v: 0 for v in range(n)}
