"""Graph analytics: fixed-iteration PageRank + fuzzy entity resolution.

Both queries are verified against independent pure-Python replays on
the smoke fixture (sf0.001) — the same double-entry bookkeeping the
DuckDB oracles provide at sf0.01, but engine-free.
"""

from __future__ import annotations

from collections import defaultdict

import pytest

from tests.conftest import SF_SMOKE


def _lineitem_pairs(spark):
    from autosinapi_spark.catalog import load

    li = (
        load(spark, SF_SMOKE, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    by_order = defaultdict(set)
    for r in li:
        by_order[r.l_orderkey].add(r.l_partkey)
    nodes = {p for ps in by_order.values() for p in ps}
    edges = set()
    for ps in by_order.values():
        for a in ps:
            for b in ps:
                if a != b:
                    edges.add((a, b))
    return nodes, edges


def test_pagerank_matches_python_replay(spark):
    from autosinapi_spark.plans.graph_analytics_queries import (
        _PR_BASE,
        _PR_INIT,
        _PR_ITERS,
        item_cooccurrence_pagerank,
    )

    nodes, edges = _lineitem_pairs(spark)
    outdeg = defaultdict(int)
    for s, _ in edges:
        outdeg[s] += 1
    rank = {n: _PR_INIT for n in nodes}
    for _ in range(_PR_ITERS):
        incoming = defaultdict(int)
        for s, d in edges:
            incoming[d] += rank[s] // outdeg[s]
        rank = {n: _PR_BASE + (85 * incoming[n]) // 100 for n in nodes}

    rows = item_cooccurrence_pagerank(spark, SF_SMOKE).collect()
    got = {r.part_key: r.pagerank_units for r in rows}
    # the query emits the top-N head (TakeOrdered; r7 change): every
    # emitted unit value must match the replay exactly, and the head
    # must BE the replay's top-|rows| under the same (pr desc, id) cut
    from autosinapi_spark.plans.graph_analytics_queries import _PR_TOP

    assert len(rows) == min(_PR_TOP, len(rank))
    for k, v in got.items():
        assert rank[k] == v
    expect_head = sorted(rank.items(), key=lambda kv: (-kv[1], kv[0]))[
        : len(rows)
    ]
    assert got == dict(expect_head)
    # rank mass: every node retains at least the base share, and the
    # damped total cannot exceed the initial mass
    assert all(v >= _PR_BASE for v in got.values())
    assert sum(rank.values()) <= _PR_INIT * len(nodes)


def test_pagerank_rank_pos_dense_and_deterministic(spark):
    from autosinapi_spark.plans.graph_analytics_queries import (
        item_cooccurrence_pagerank,
    )

    rows = item_cooccurrence_pagerank(spark, SF_SMOKE).collect()
    by_pos = sorted(rows, key=lambda r: (r.rank_pos, r.part_key))
    # RANK() semantics: ties share a position; positions ordered by
    # (pagerank desc, id asc)
    prev = None
    for r in by_pos:
        if prev is not None:
            assert (r.pagerank_units, -r.part_key) <= (
                prev.pagerank_units,
                -prev.part_key,
            ) or r.pagerank_units == prev.pagerank_units
        prev = r
    assert by_pos[0].rank_pos == 1


def _er_python_replay(spark):
    import re

    from autosinapi_spark.catalog import load
    from autosinapi_spark.plans.graph_analytics_queries import _ER_MAX_DIST

    def lev(a: str, b: str) -> int:
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(
                        prev[j] + 1,
                        cur[-1] + 1,
                        prev[j - 1] + (ca != cb),
                    )
                )
            prev = cur
        return prev[-1]

    parts = [
        (r.p_partkey, r.p_name.strip().lower())
        for r in load(spark, SF_SMOKE, "part")
        .select("p_partkey", "p_name")
        .collect()
    ]
    blocks = defaultdict(list)
    for pk, nm in parts:
        m = re.search(r"(\S+)$", nm)
        blocks[m.group(1) if m else ""].append((pk, nm))

    parent = {pk: pk for pk, _ in parts}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for members in blocks.values():
        for i, (pa, na) in enumerate(members):
            for pb, nb in members[i + 1 :]:
                if lev(na, nb) <= _ER_MAX_DIST:
                    ra, rb = find(pa), find(pb)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
    comp = defaultdict(set)
    for pk, _ in parts:
        comp[find(pk)].add(pk)
    return {pk: min(comp[find(pk)]) for pk, _ in parts}, dict(parts)


def test_entity_resolution_matches_union_find(spark):
    from autosinapi_spark.plans.graph_analytics_queries import (
        entity_resolution_parts,
    )

    expect, names = _er_python_replay(spark)
    rows = entity_resolution_parts(spark, SF_SMOKE).collect()
    got = {r.part_key: r.entity_id for r in rows}
    assert got == expect
    sizes = defaultdict(int)
    for eid in expect.values():
        sizes[eid] += 1
    for r in rows:
        assert r.entity_size == sizes[r.entity_id]
        assert r.is_rep == (1 if r.part_key == r.entity_id else 0)
        assert r.rep_name == names[r.entity_id]
    # the fixture vocabulary (8 adjectives x 8 nouns) must actually
    # produce fuzzy merges, or the test is vacuous
    assert any(s > 1 for s in sizes.values())


@pytest.mark.parametrize("q", ["item_cooccurrence_pagerank",
                               "entity_resolution_parts",
                               "embedding_covariance"])
def test_new_queries_have_oracles(q):
    import __spark_entry__ as e

    assert q in e.queries()
    assert q in e.oracle_sql()


def test_bfs_khop_python_replay(spark):
    """BFS distances replayed with a plain Python queue over the same
    basket-co-occurrence edges."""
    from collections import deque

    from autosinapi_spark.catalog import load
    from autosinapi_spark.plans.graph_analytics_queries import (
        _BFS_HOPS,
        _BFS_SEEDS,
        bfs_khop_distances,
    )
    from tests.conftest import SF_SMOKE

    got = {
        (r.seed, r.node): r.dist
        for r in bfs_khop_distances(spark, SF_SMOKE).collect()
    }
    li = (
        load(spark, SF_SMOKE, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    baskets = {}
    for r in li:
        baskets.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    adj = {}
    for ps in baskets.values():
        for a in ps:
            for b in ps:
                if a != b:
                    adj.setdefault(a, set()).add(b)
    seeds = sorted(adj)[:_BFS_SEEDS]
    want = {}
    for s in seeds:
        dist = {s: 0}
        dq = deque([s])
        while dq:
            x = dq.popleft()
            if dist[x] == _BFS_HOPS:
                continue
            for y in adj.get(x, ()):
                if y not in dist:
                    dist[y] = dist[x] + 1
                    dq.append(y)
        for n, d in dist.items():
            want[(s, n)] = d
    assert got == want


def test_label_propagation_python_replay(spark):
    """Synchronous LPA replayed in plain Python over the same
    undirected basket edges: init label = vertex id; each round every
    vertex adopts its neighbors' most frequent label with the
    (count DESC, label ASC) tiebreak, all updates simultaneous. This
    is the engine-free double-entry for the unrolled-CTE oracle, and
    it pins the r8 single-exchange rewrite (repartition(u) serving
    both round aggregates) to the textbook recursion."""
    from collections import Counter

    from autosinapi_spark.plans.graph_analytics_queries import (
        _LPA_ROUNDS,
        label_propagation_communities,
    )

    got = {
        r.part_key: r.community
        for r in label_propagation_communities(spark, SF_SMOKE).collect()
    }
    _, edges = _lineitem_pairs(spark)  # symmetric (a, b) pairs, a != b
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
    lab = {v: v for v in adj}
    for _ in range(_LPA_ROUNDS):
        nxt = {}
        for v, nbrs in adj.items():
            c = Counter(lab[n] for n in nbrs)
            # max count first, then smallest label
            nxt[v] = min(c, key=lambda L: (-c[L], L))
        lab = nxt
    assert got == lab
