"""Round-14-registered queries (plans/staged_r14.py): Python replays
+ structural invariants.

The Spark-vs-DuckDB oracle compare lives in tests/test_correctness.py
since the r14 flip registered the cohort (a duplicate compare ran
here while it was staged in r13); what stays is what the registry
compare can't express — pure-Python replays (equal-count
rank/file/envelope arithmetic from raw rows; butterfly counts from a
brute 4-cycle enumeration; the keyed-state machine for the dedup
replay), plan-shape pins, the duplicate-event_id guard fixture, and
the hypothesis properties."""

from __future__ import annotations

from collections import defaultdict
from itertools import combinations

from autosinapi_spark.plans.staged_r14 import (
    _LSK_BLKW,
    _LSK_FILES,
)
from tests.conftest import SF_SMOKE


# --- equal-count layout skipping: full Python replay -----------------

def _py_hb_xy2d(n: int, x: int, y: int) -> int:
    """Wikipedia's public-domain xy2d (same reference as the r13b
    replay test) — the ground truth the packed-table automaton in
    the Spark/DuckDB expression must equal."""
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = n - 1 - x
                y = n - 1 - y
            x, y = y, x
        s //= 2
    return d


def _py_norm(v: int, lo: int, hi: int, bits: int) -> int:
    top = (1 << bits) - 1
    return 0 if hi == lo else ((v - lo) * top) // (hi - lo)


def _py_morton(px: int, sx: int, bits: int) -> int:
    # _z_expr('px', 'sx') convention: x (partkey) takes the EVEN
    # bits, y (suppkey) the odd bits
    z = 0
    for i in range(bits):
        z |= ((px >> i) & 1) << (2 * i)
        z |= ((sx >> i) & 1) << (2 * i + 1)
    return z


def test_layout_skipping_matches_python_replay(spark, duck):
    """Re-derive the WHOLE stats table from raw lineitem rows in
    Python: curve values (reference xy2d / reference Morton), exact
    rank by (val, 4-key tiebreak), equal-count file cuts, per-file
    envelopes, ppm arithmetic — and compare every emitted cell."""
    from autosinapi_spark.plans.staged_r13b import _HB_N
    from autosinapi_spark.plans.staged_r14 import (
        layout_skipping_equalcount,
    )

    rows = duck.execute(
        "SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey "
        "FROM lineitem"
    ).fetchall()
    n = len(rows)
    pks = [r[2] for r in rows]
    sks = [r[3] for r in rows]
    pmin, pmax, smin, smax = min(pks), max(pks), min(sks), max(sks)
    bits = 16

    def curve_rows(layout):
        out = []
        for ok, ln, pk, sk in rows:
            if layout == "hilbert":
                v = _py_hb_xy2d(
                    _HB_N,
                    _py_norm(pk, pmin, pmax, bits),
                    _py_norm(sk, smin, smax, bits),
                )
            else:
                v = _py_morton(
                    _py_norm(pk, pmin, pmax, bits),
                    _py_norm(sk, smin, smax, bits),
                    bits,
                )
            out.append((v, ok, ln, pk, sk))
        return out

    files: dict[tuple[str, int], list[tuple[int, int]]] = defaultdict(
        list
    )
    for layout in ("hilbert", "zorder"):
        ranked = sorted(curve_rows(layout))
        for rnk0, (_, _, _, pk, sk) in enumerate(ranked):
            files[(layout, rnk0 * _LSK_FILES // n)].append((pk, sk))
    for ok, ln, pk, sk in rows:
        files[("hash", ok % _LSK_FILES)].append((pk, sk))

    pk_hi = pmin + (pmax - pmin) // 4
    sk_hi = smin + (smax - smin) // 4
    expect = {}
    for layout in ("hash", "hilbert", "zorder"):
        fl = {
            fid: v for (la, fid), v in files.items() if la == layout
        }
        nf = len(fl)
        pk_ext = sum(
            max(p for p, _ in v) - min(p for p, _ in v)
            for v in fl.values()
        )
        sk_ext = sum(
            max(s for _, s in v) - min(s for _, s in v)
            for v in fl.values()
        )
        skip_pk = [
            v for v in fl.values() if min(p for p, _ in v) > pk_hi
        ]
        skip_sk = [
            v for v in fl.values() if min(s for _, s in v) > sk_hi
        ]
        total = sum(len(v) for v in fl.values())
        scanned_pk = total - sum(len(v) for v in skip_pk)
        scanned_sk = total - sum(len(v) for v in skip_sk)
        expect[layout] = (
            nf,
            pk_ext * 1_000_000 // (nf * (pmax - pmin)),
            sk_ext * 1_000_000 // (nf * (smax - smin)),
            len(skip_pk),
            len(skip_sk),
            scanned_pk * 1_000_000 // total,
            scanned_sk * 1_000_000 // total,
        )

    got = {
        r.layout: (
            r.n_files,
            r.pk_extent_ppm,
            r.sk_extent_ppm,
            r.n_skip_pk,
            r.n_skip_sk,
            r.pk_scan_ppm,
            r.sk_scan_ppm,
        )
        for r in layout_skipping_equalcount(spark, SF_SMOKE).collect()
    }
    assert got == expect
    # the row that justifies the query: equal-count Hilbert envelopes
    # strictly tighter than Morton's on at least one key, both far
    # tighter than hash
    assert got["hilbert"][1] < got["zorder"][1]
    assert got["zorder"][1] < got["hash"][1] // 3


def test_layout_skipping_rank_blocks_are_order_preserving():
    """The distributed rank's invariant: block id = val DIV width is
    monotone in val, so (block offset + intra-block row_number) IS
    the global rank — checked on an adversarial value multiset with
    duplicates, empty blocks, and block-boundary values."""
    vals = [0, 1, _LSK_BLKW - 1, _LSK_BLKW, _LSK_BLKW, _LSK_BLKW + 1,
            5 * _LSK_BLKW, 5 * _LSK_BLKW, (1 << 32) - 1]
    blocks: dict[int, list[int]] = defaultdict(list)
    for v in vals:
        blocks[v // _LSK_BLKW].append(v)
    # offsets + intra row_numbers reproduce 1..n over the sorted order
    reconstructed = []
    off = 0
    for b in sorted(blocks):
        for i, v in enumerate(sorted(blocks[b]), start=1):
            reconstructed.append((off + i, v))
        off += len(blocks[b])
    assert [v for _, v in sorted(reconstructed)] == sorted(vals)
    assert [r for r, _ in sorted(reconstructed)] == list(
        range(1, len(vals) + 1)
    )


# --- butterflies: brute-force 4-cycle ground truth -------------------

def test_butterfly_matches_bruteforce_on_planted_fixture(
    spark, tmp_path
):
    """Plant a bipartite graph with known butterfly structure and
    compare against literal K2,2 enumeration (every order pair x
    item pair closing a rectangle)."""
    from autosinapi_spark.plans.staged_r14 import (
        butterfly_item_bipartite,
    )

    # orders 1..4 over items: a clique-ish core {10, 11, 12} shared
    # by orders 1-3 (many butterflies), a pendant item 13 in one
    # order (no butterflies), and a duplicate (order, item) row that
    # the DISTINCT/collect_set must collapse
    edges = [
        (1, 10), (1, 11), (1, 12),
        (2, 10), (2, 11), (2, 12),
        (3, 10), (3, 11),
        (4, 13), (4, 10),
        (1, 10),  # duplicate row
    ]
    spark.createDataFrame(
        [(o, 1, p, 1) for o, p in edges],
        "l_orderkey long, l_linenumber long, l_partkey long, "
        "l_suppkey long",
    ).write.parquet(f"{tmp_path}/lineitem.parquet")

    dedup = sorted(set(edges))
    by_order: dict[int, set[int]] = defaultdict(set)
    for o, p in dedup:
        by_order[o].add(p)
    # brute force: butterflies per item = # of (order pair, partner
    # item) combos where both orders contain both items
    bfly: dict[int, int] = defaultdict(int)
    wedge: dict[int, int] = defaultdict(int)
    orders = sorted(by_order)
    items = sorted({p for _, p in dedup})
    for i, j in combinations(items, 2):
        c = sum(
            1 for o in orders if i in by_order[o] and j in by_order[o]
        )
        if c:
            wedge[i] += c
            wedge[j] += c
            b = c * (c - 1) // 2
            bfly[i] += b
            bfly[j] += b

    got = {
        r.part_id: (r.n_copair_orders, r.n_butterflies)
        for r in butterfly_item_bipartite(
            spark, str(tmp_path)
        ).collect()
    }
    expect = {p: (wedge[p], bfly[p]) for p in wedge}
    assert got == expect
    assert got[10][1] >= 3, "core item must close multiple butterflies"
    assert got[13] == (1, 0), "pendant item: one wedge, no butterfly"


def test_butterfly_head_is_take_ordered(spark):
    from autosinapi_spark.plans.staged_r14 import (
        butterfly_item_bipartite,
    )

    plan = (
        butterfly_item_bipartite(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_layout_skipping_no_cartesian_and_no_global_sort(spark):
    """The stats plan may broadcast 1-row bounds (BNLJ) but must
    never cartesian data-by-data, and the fact table must never be
    globally sorted (the rank comes from the block machinery)."""
    from autosinapi_spark.plans.staged_r14 import (
        layout_skipping_equalcount,
    )

    df = layout_skipping_equalcount(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # the only range exchange allowed is the final 3-row ORDER BY; a
    # second one would mean the fact table is being globally sorted
    # (the rank must come from the block machinery instead)
    assert plan.lower().count("rangepartitioning") <= 1


# --- streaming dedup replay: keyed-state-machine ground truth ---------

def test_streaming_dedup_replay_matches_state_machine(spark, duck):
    """Re-simulate the keyed state machine in pure Python over the
    same synthetic arrival stream (insert on first arrival, drop
    while armed, re-arm on every retained arrival) and compare every
    per-type count."""
    from collections import defaultdict

    from autosinapi_spark.plans.staged_r14 import (
        _SDD_DELAY_US,
        _SDD_FAST,
        _SDD_FAST_US,
        _SDD_SLOW,
        _SDD_SLOW_US,
        streaming_dedup_replay,
    )

    rows = duck.execute(
        "SELECT event_id, event_type, epoch_us(ts) FROM events"
    ).fetchall()
    arrivals = []
    for eid, etype, us in rows:
        arrivals.append((eid, etype, us))
        if eid % _SDD_FAST == 0:
            arrivals.append((eid, etype, us + _SDD_FAST_US))
        if eid % _SDD_SLOW == 0:
            arrivals.append((eid, etype, us + _SDD_SLOW_US))

    last_kept: dict[int, int] = {}
    seen: dict[int, int] = defaultdict(int)
    kept = defaultdict(int)
    dropped = defaultdict(int)
    leaked = defaultdict(int)
    # per-key arrival order (the window's ORDER BY a)
    by_key: dict[int, list[tuple[int, str]]] = defaultdict(list)
    for eid, etype, us in arrivals:
        by_key[eid].append((us, etype))
    for eid, seq in by_key.items():
        for i, (us, etype) in enumerate(sorted(seq)):
            if eid not in last_kept:
                last_kept[eid] = us
                kept[etype] += 1
            elif us - last_kept[eid] <= _SDD_DELAY_US:
                dropped[etype] += 1
            else:
                last_kept[eid] = us
                kept[etype] += 1
                leaked[etype] += 1
            seen[eid] += 1

    got = {
        r.event_type: (r.n_kept, r.n_dupes_dropped, r.n_dupes_leaked)
        for r in streaming_dedup_replay(spark, SF_SMOKE).collect()
    }
    expect = {
        t: (kept[t], dropped[t], leaked[t]) for t in kept
    }
    assert got == expect
    assert sum(v[1] for v in got.values()) > 0, "no duplicate dropped"
    assert sum(v[2] for v in got.values()) > 0, "no duplicate leaked"


def test_streaming_dedup_duplicate_event_id_raises(spark, tmp_path):
    """The two-lag closure's PRECONDITION (docstring): chain depth
    <= 3, which holds iff event_id is unique in the base table. A
    planted duplicate would make Spark AND the oracle compute the
    same wrong keyed-state emulation — parity green, semantics
    broken — so the runtime assert_true(rn <= 3) must fail loud
    instead, and a unique-keyed frame must pass the guard."""
    import datetime as _dt

    import pytest as _pytest

    from autosinapi_spark.plans.staged_r14 import (
        _SDD_FAST,
        streaming_dedup_replay,
    )

    t0 = _dt.datetime(2024, 1, 1)
    schema = (
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    # the duplicated key is a multiple of _SDD_FAST so it gains the
    # fast re-delivery too: 2 base + 2 fast = 4 arrivals > 3
    bad = str(tmp_path / "bad")
    spark.createDataFrame(
        [
            (_SDD_FAST, t0, 1, "click", 1.0, "{}"),
            (_SDD_FAST, t0 + _dt.timedelta(minutes=5), 1, "click", 1.0, "{}"),
            (2, t0, 1, "view", 1.0, "{}"),
        ],
        schema,
    ).write.parquet(f"{bad}/events.parquet")
    with _pytest.raises(Exception, match="duplicate event_id"):
        streaming_dedup_replay(spark, bad).collect()

    ok = str(tmp_path / "ok")
    spark.createDataFrame(
        [
            (_SDD_FAST, t0, 1, "click", 1.0, "{}"),
            (2, t0, 1, "view", 1.0, "{}"),
        ],
        schema,
    ).write.parquet(f"{ok}/events.parquet")
    rows = streaming_dedup_replay(spark, ok).collect()
    # the fast re-delivery of event _SDD_FAST is dropped by state
    assert {r.event_type: (r.n_kept, r.n_dupes_dropped, r.n_dupes_leaked)
            for r in rows} == {"click": (1, 1, 0), "view": (1, 0, 0)}


def test_streaming_dedup_gaps_sit_outside_the_ambiguity_band():
    """The replay's gap rule equals the engine's global-watermark
    expiry only because the synthetic gaps avoid the [delay, 2*delay]
    band where batching decides the outcome (see the query's
    semantics note) — pin that construction so a future gap retune
    can't silently enter the band."""
    from autosinapi_spark.plans.staged_r14 import (
        _SDD_DELAY_US,
        _SDD_FAST_US,
        _SDD_SLOW_US,
    )

    assert _SDD_FAST_US < _SDD_DELAY_US
    assert _SDD_SLOW_US > 2 * _SDD_DELAY_US


# --- hypothesis properties (pure Python, no Spark) --------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(
        edges=st.lists(
            st.tuples(st.integers(0, 5), st.integers(10, 16)),
            max_size=30,
        )
    )
    def test_butterfly_closed_form_equals_rectangle_enumeration(edges):
        """The per-pair C(c, 2) closed form the query aggregates must
        equal literal K2,2 enumeration (choose 2 orders x 2 items,
        all four edges present) on ANY bipartite graph — duplicate
        edges collapse first, exactly like the query's DISTINCT."""
        dedup = set(edges)
        by_order: dict[int, set[int]] = defaultdict(set)
        for o, p in dedup:
            by_order[o].add(p)
        items = sorted({p for _, p in dedup})
        orders = sorted(by_order)

        closed: dict[int, int] = defaultdict(int)
        for i, j in combinations(items, 2):
            c = sum(
                1
                for o in orders
                if i in by_order[o] and j in by_order[o]
            )
            b = c * (c - 1) // 2
            closed[i] += b
            closed[j] += b

        brute: dict[int, int] = defaultdict(int)
        for o1, o2 in combinations(orders, 2):
            for i, j in combinations(items, 2):
                if (
                    i in by_order[o1]
                    and j in by_order[o1]
                    and i in by_order[o2]
                    and j in by_order[o2]
                ):
                    brute[i] += 1
                    brute[j] += 1

        assert {k: v for k, v in closed.items() if v} == {
            k: v for k, v in brute.items() if v
        }

    @settings(max_examples=300, deadline=None)
    @given(
        gaps=st.lists(
            st.integers(1, 4 * 3_600_000_000), min_size=0, max_size=2
        ),
        delay=st.integers(1, 2 * 3_600_000_000),
    )
    def test_dedup_lag_closure_equals_generic_state_machine(
        gaps, delay
    ):
        """The query's two-lag CASE closure (rn <= 3) must equal the
        generic keyed state machine (drop while armed, re-arm on
        every retained arrival) for ANY gap values and delay — the
        depth bound is structural (<= 3 arrivals per key by
        construction), the gap values are not."""
        a0 = 0
        arrivals = [a0]
        for g in gaps:
            arrivals.append(arrivals[-1] + g)
        arrivals.sort()

        # generic state machine
        last_kept = None
        kept_sm = []
        for a in arrivals:
            if last_kept is None or a - last_kept > delay:
                last_kept = a
                kept_sm.append(True)
            else:
                kept_sm.append(False)

        # the query's closure: rn=1 kept; rn=2 by gap to a1; rn=3 by
        # whether rn=2 was kept (a1 - a2 > delay re-reads that gap)
        kept_cl = []
        for idx, a in enumerate(arrivals):
            rn = idx + 1
            a1 = arrivals[idx - 1] if idx >= 1 else None
            a2 = arrivals[idx - 2] if idx >= 2 else None
            if rn == 1:
                kept_cl.append(True)
            elif rn == 2:
                kept_cl.append(a - a1 > delay)
            elif a1 - a2 > delay:
                kept_cl.append(a - a1 > delay)
            else:
                kept_cl.append(a - a2 > delay)

        assert kept_cl == kept_sm

except ImportError:  # pragma: no cover - hypothesis ships in the image
    pass
