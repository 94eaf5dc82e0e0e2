"""Repetitive-corpus stress test for the staged suffix ranker
(r11 verdict ask #5: measure the shape its docstring warns about
BEFORE the r13 registration flip).

Builds a maximally repetitive corpus in /tmp — ONE sf0.1 document's
text replicated N times under distinct doc_ids, sized to the same
total position count as the real sf0.1 corpus (~1.49M) — and times
``suffix_window_rank`` on both corpora in one warm session.

Why this is the adversarial case for value-range blocking: with every
document identical, the distinct pair-code frame collapses to ~L
values per round (L = document length), so almost all of the Θ(n)
position rows share a handful of codes — the re-rank join back is a
massive-skew hash join and the dup-count aggregate has ~L groups for
1.5M rows. The measurement answers whether partial aggregation +
broadcast of the tiny rank frame absorb that skew or whether the row
needs a cap/fallback before registration.

Run: python tools/stress_repetitive.py  [--copies=N]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

SRC = Path("/root/testdata/sf0.1")
DST = Path("/tmp/sfx_repetitive")


def build(copies: int | None) -> int:
    t = pq.read_table(SRC / "documents.parquet")
    # the longest document, replicated to ~the sf0.1 position count
    lens = [len(x.as_py() or "") for x in t.column("text")]
    i = max(range(len(lens)), key=lambda j: lens[j])
    text = t.column("text")[i].as_py()
    n = copies or (sum(lens) // len(text))
    DST.mkdir(parents=True, exist_ok=True)
    out = pa.table(
        {
            "doc_id": pa.array(range(1, n + 1), pa.int64()),
            "text": pa.array([text] * n),
            "lang": pa.array(["en"] * n),
            "source": pa.array(["rep"] * n),
            "n_chars": pa.array([len(text)] * n, pa.int64()),
        }
    )
    pq.write_table(out, DST / "documents.parquet")
    return n * len(text)


def main() -> int:
    copies = None
    for a in sys.argv[1:]:
        if a.startswith("--copies="):
            copies = int(a.split("=", 1)[1])
    total = build(copies)
    print(f"repetitive corpus: {total} positions at {DST}")

    from autosinapi_spark.plans.staged_r13 import suffix_window_rank
    from autosinapi_spark.session import get_spark

    spark = get_spark(app_name="stress_repetitive")

    def run(sf_dir: str, label: str) -> None:
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            df = suffix_window_rank(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            w = time.perf_counter() - t0
            best = w if best is None else min(best, w)
        print(f"{label}: min-of-2 {best:.2f}s")

    run(str(SRC), "sf0.1 real corpus")
    run(str(DST), "repetitive corpus (same position count)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
