"""Round-13-registered suffix ranking (plans/staged_r13.py): Python
replays + structural invariants.

The Spark-vs-DuckDB oracle compare lives in tests/test_correctness.py
since the r13 flip registered the query (a duplicate compare ran here
while it was staged in r12); what stays is what the registry compare
can't express — the pure-Python replay of the prefix-doubling
arithmetic against a direct sorted-windows reference, the guard-path
fixtures, plan pins, and the hypothesis property test."""

from __future__ import annotations

from autosinapi_spark.plans.staged_r13 import (
    _SFX_TOP,
    _SFX_WINDOW,
)
from tests.conftest import SF_SMOKE


def test_suffix_rank_matches_python_replay(spark, duck):
    """Direct reference: sort every (doc, pos) by its 32-char window
    (Python's str ordering == binary collation on the ASCII fixture),
    assign dense ranks and duplicate counts, and compare the full
    emitted head — rank values, duplicate counts, tie order, and the
    window text itself."""
    from collections import Counter

    from autosinapi_spark.plans.staged_r13 import suffix_window_rank

    texts = dict(
        duck.execute("SELECT doc_id, text FROM documents").fetchall()
    )
    wins = []
    for doc_id, text in texts.items():
        for i in range(len(text)):
            wins.append((text[i : i + _SFX_WINDOW], doc_id, i))
    dup = Counter(w for w, _, _ in wins)
    wins.sort()
    ranks: dict[str, int] = {}
    for w, _, _ in wins:
        if w not in ranks:
            ranks[w] = len(ranks) + 1
    expect = [
        (ranks[w], dup[w], doc_id, i, w)
        for w, doc_id, i in wins[:_SFX_TOP]
    ]

    got = [
        (r.sfx_rank, r.dup_count, r.doc_id, r.local_pos, r.window_text)
        for r in suffix_window_rank(spark, SF_SMOKE).collect()
    ]
    assert got == expect
    # the head must genuinely contain duplicate windows, or the
    # dedup-signal column is untested
    assert any(d > 1 for _, d, _, _, _ in expect)


def test_suffix_rank_plan_shape(spark):
    """Pins: the head is TakeOrdered (never a global sort of the
    position set), no cartesian anywhere, and the documents scan
    prunes to (doc_id, text)."""
    from autosinapi_spark.plans.staged_r13 import suffix_window_rank

    plan = (
        suffix_window_rank(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_suffix_rank_empty_doc_guard(spark, tmp_path):
    """Spark's sequence(0, length - 1) on an empty text yields the
    DESCENDING [0, -1] — two phantom positions — where the oracle's
    range(0, 0) is empty. The length guard must drop empty documents
    entirely (and a 1-char corpus must still rank)."""
    from autosinapi_spark.plans.staged_r13 import suffix_window_rank

    sf = str(tmp_path)
    spark.createDataFrame(
        [
            (1, "", "en", "src0", 0),
            (2, "a", "en", "src0", 1),
            (3, "ba", "en", "src0", 2),
        ],
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    ).write.parquet(f"{sf}/documents.parquet")

    rows = [tuple(r) for r in suffix_window_rank(spark, sf).collect()]
    # positions: doc2 'a'@0, doc3 'ba'@0 + 'a'@1 -> windows
    # 'a' (x2, rank 1), 'ba' (rank 2); doc1 contributes NOTHING
    assert rows == [
        (1, 2, 2, 0, "a"),
        (1, 2, 3, 1, "a"),
        (2, 1, 3, 0, "ba"),
    ]


def test_suffix_rank_non_ascii_raises(spark, tmp_path):
    """Codepoints past ascii 127 must raise at runtime (r11 ADVICE:
    loud error, never a bare ANSI overflow or silent rank
    corruption): even Latin-1's 255 packs to ~4.3e9, whose round-1
    pair square exceeds 2^63 — so 'é' (U+00E9) raises, not just
    wide CJK codepoints."""
    import pytest as _pytest

    from autosinapi_spark.plans.staged_r13 import suffix_window_rank

    # the USER_RAISED_EXCEPTION surfaces wrapped: AQE materializes the
    # loop's localCheckpoint stages and reports the task failure as a
    # STAGE_MATERIALIZATION Py4JJavaError, so match the message, not a
    # specific exception class
    for bad in ("café", "naïve 中"):
        sf = str(tmp_path / f"bad{len(bad)}")
        spark.createDataFrame(
            [(1, "plain ascii", "en", "src0", 11), (2, bad, "fr", "src0", len(bad))],
            "doc_id long, text string, lang string, source string, "
            "n_chars long",
        ).write.parquet(f"{sf}/documents.parquet")
        with _pytest.raises(Exception, match="non-ASCII codepoint"):
            suffix_window_rank(spark, sf).collect()

    # pure-ASCII corpus passes the guard and ranks normally; a NULL
    # text must pass it too (rlike(NULL) is NULL — without the isNull
    # arm the when() would fall through to the raise) and be dropped
    # by the length filter exactly like an empty document
    sf2 = str(tmp_path / "ok")
    spark.createDataFrame(
        [(1, "cafe", "fr", "src0", 4), (2, None, "fr", "src0", 0)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    ).write.parquet(f"{sf2}/documents.parquet")
    rows = suffix_window_rank(spark, sf2).collect()
    assert len(rows) == 4  # one window per doc-1 position; doc 2 none
    assert {r.doc_id for r in rows} == {1}


# --- prefix-doubling arithmetic: property test over random corpora ---

def _py_doubling_ranks(
    texts: dict[int, str], pack: int, rounds: int
) -> dict[tuple[int, int], int]:
    """The exact integer arithmetic the Spark plan runs (pack codes,
    neighbor pairing with 0-sentinel, dense re-rank per round), as a
    pure function: (doc_id, pos) -> final dense rank."""
    pos = {}
    for doc_id, text in texts.items():
        for i in range(len(text)):
            code = 0
            for j in range(pack):
                c = ord(text[i + j]) if i + j < len(text) else 0
                code = code * 256 + c
            pos[(doc_id, i)] = code
    step = pack
    for _ in range(rounds):
        mr = max(pos.values(), default=0)
        paired = {
            (doc_id, p): r1 * (mr + 1)
            + pos.get((doc_id, p + step), 0)
            for (doc_id, p), r1 in pos.items()
        }
        dense = {v: i + 1 for i, v in enumerate(sorted(set(paired.values())))}
        pos = {k: dense[v] for k, v in paired.items()}
        step *= 2
    return pos


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        texts=st.lists(
            st.text(alphabet="ab ", min_size=0, max_size=40),
            min_size=1,
            max_size=8,
        )
    )
    def test_doubling_equals_direct_window_ranks(texts):
        """For ANY corpus (tiny alphabet -> heavy ties, lengths below
        the pack width, empty docs): the pack+doubling ranks must
        equal the dense ranks of directly-sorted 32-char windows —
        the identity the DuckDB oracle checks on the fixture,
        exercised here on adversarial shapes."""
        from autosinapi_spark.plans.staged_r13 import (
            _SFX_PACK,
            _SFX_ROUNDS,
            _SFX_WINDOW,
        )

        corpus = {i: t for i, t in enumerate(texts)}
        got = _py_doubling_ranks(corpus, _SFX_PACK, _SFX_ROUNDS)

        wins = sorted(
            (t[i : i + _SFX_WINDOW], doc_id, i)
            for doc_id, t in corpus.items()
            for i in range(len(t))
        )
        ranks: dict[str, int] = {}
        for w, _, _ in wins:
            if w not in ranks:
                ranks[w] = len(ranks) + 1
        expect = {(doc_id, i): ranks[w] for w, doc_id, i in wins}
        assert got == expect

except ImportError:  # pragma: no cover - hypothesis ships in the image
    pass
