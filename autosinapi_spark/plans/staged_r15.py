"""Round-15 registration candidates (built and staged in round 14;
NOT registered until the r15 window rewrite).

Registration budget note: the r14 flip took the registry to 204
(bound 5, capacity 250, ~46 slots of lifetime slack). Staging SIX
more here keeps the post-flip registry at 210 — far inside the
bound — while the r15 window still fits its mandatory set (6
never-green + changed-code promotions + the 11 r10 leftovers as
lead fill; docs/R15_PLAN.md).

- ``kneser_ney_bigram_ppm`` — Kneser-Ney smoothed bigram
  probabilities (Kneser & Ney 1995, "Improved backing-off for
  m-gram language modeling"; Chen & Goodman 1999's empirical study
  made absolute discounting with continuation counts the standard
  n-gram smoother — the model KenLM builds and the CCNet/Gopher
  quality filters score with). The registered ``doc_bigram_logprob``
  interpolates raw MLE bigram/unigram estimates; KN differs in BOTH
  terms: the bigram count is absolute-discounted (c - D, D = 3/4)
  and the backoff weight redistributes exactly the discounted mass
  onto the CONTINUATION probability — how many distinct contexts a
  word follows, not how often it occurs ("San Francisco" makes
  "Francisco" frequent but nearly single-context, so KN correctly
  refuses to predict it after novel words). With D = 3/4 every
  quantity is a ratio of integers, so the probability is emitted as
  exact integer ppm: p_kn = ((4c - 3) * T + 3 * n1r * n1l) /
  (4 * cl * T), with cl = c(w1), n1r = N1+(w1 .), n1l = N1+(. w2),
  T = N1+(..) — engine-identical truncating division (the
  ols_trend_fit / chi2_independence_ppm convention).

- ``ktruss_peel_trace`` — k-truss peeling (Cohen 2008, "Trusses:
  cohesive subgraphs for social network analysis"; the parallel
  peel-all-at-once iteration is the shape of Wang & Cheng 2012 and
  Sariyuce et al. 2017's nucleus decomposition round): every edge of
  the order-item co-occurrence graph needs support >= k - 2
  surviving triangles, edges below the bar are removed
  simultaneously, and the round repeats on the shrunken graph. The
  registered ``kcore_item_graph`` / ``kcore_onion_layers`` rows peel
  on VERTEX degree; the truss is the strictly stronger cohesion
  notion (every k-truss is a (k-1)-core but not conversely) and is
  the standard community/boilerplate-cluster primitive. The truss
  order is CORPUS-ADAPTIVE: k - 2 = round-0's integer-mean edge
  support (3 * n_triangles DIV n_supported_edges, a 1-row aggregate
  riding the scalar-broadcast pattern, held fixed across rounds) —
  a fixed literal k cannot bite across scale factors because the
  fixture graph's support median swings 42 -> 10 from sf0.001 to
  sf0.01 (measured). Emits the per-round trace (edges, removals,
  surviving triangles) over ``_KT_ROUNDS`` fixed rounds — the
  fixture converges inside the budget at both pytest and driver SFs
  (asserted in tests), and the trace rows make convergence
  observable (final round removes 0).

- ``media_ahash_near_dup`` — perceptual-hash near-duplicate
  detection over the media catalog: the 64-bit average hash (aHash —
  resize to 8x8, bit = pixel > mean; the standard image-dedup hash)
  computed per payload by the Arrow-batched multimodal operator
  (``operators/multimodal.ahash_bands``; codec-free fake decode =
  a stride-5 prefix strip of the payload bytes, everything past the
  fake bitmap real), banded into 4 x 16-bit keys for
  Hamming-distance LSH: any pair within Hamming 3 of 64 bits MUST
  share at least one exact band (pigeonhole — 100% recall by
  construction, asserted against brute force in tests), candidates
  verified with exact bit_count. Length-normalized sampling was
  measured first and rejected: a single insertion shifts every
  downstream sample (min fixture Hamming 5, zero pairs within the
  bar); the prefix strip emulates the spatial stability a real
  image resize has (30 pairs at sf0.01, 44 at sf0.001 — measured).

- ``hll_distinct_union`` — the register-MERGE (union) companion to
  the registered single-set ``hll_distinct_flags`` (r9), exactly as
  ``kmv_set_overlap`` is the set-algebra companion to
  ``distinct_kmv_orders``: per-status sketches over OVERLAPPING
  customer sets plus the register-wise-max merged union row — the
  operation the r9 row's docstring only asserts (per-partition
  states combine by elementwise MAX without rescan) demonstrated
  and oracle-checked across sets, with union != sum because the
  sets overlap. Distinct machinery too: trailing-zeros rank (the
  Flajolet-Martin form; exact cross-engine because log2(w & -w) is
  a power of two — vs r9's bitlen-string leading-zero form) and a
  PURE-INTEGER estimate (one DECIMAL(38,0) division with alpha as
  a ppm rational — vs r9's IEEE division of identical integers).

- ``hyperball_neighborhood`` — HyperBall / ANF (Palmer et al. 2002;
  Boldi & Vigna 2013): the neighborhood function N(r) of the item
  graph from per-VERTEX HLL sketches merged register-wise-MAX along
  edges — the sketch x graph composition (the centrality/diameter
  primitive exact BFS cannot afford at scale). Registers ride as m
  INT columns, so each round is one equi-join + one map-side-
  combinable grouped MAX — never an E x m explosion.

- ``local_clustering_coeff`` — local clustering coefficients
  (Watts & Strogatz 1998): per-vertex triangle density
  2*tri / (deg*(deg-1)) as exact integer ppm — the canonical
  cohesion metric completing the graph family (triangles count,
  k-core / k-truss decompose; the coefficient NORMALIZES). Reuses
  the ktruss round-0 support machinery verbatim plus the identity
  tri(v) = sum of incident edge supports DIV 2 (property-tested),
  so the whole reduction past the support frame is one symmetrize
  + one map-side-combinable vertex aggregate and a TakeOrdered
  head.

Each entry carries a full DuckDB oracle; tests/test_staged_r15.py
runs the Spark-vs-oracle compare pre-registration (the duplicate-
compare convention every staged cohort uses before its flip) plus
pure-Python replays (the full KN arithmetic from raw texts; the full
peel trace from raw lineitem rows and on a planted clique fixture;
the full aHash banding + brute-force recall check) and plan-shape
pins.

Reference parity note: the reference engine (a single-process pandas
ETL, /root/reference/autosinapi/) has no LM, graph, or media
operators — all three are extensions for the 100 TB curation target.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.text import tokens
from .graph_analytics_queries import _basket_edges
from .registry import QuerySpec

STAGED: dict[str, QuerySpec] = {}


def stage(name: str, oracle: str | None, doc: str = ""):
    """Decorator: stage a query as an r15 registration candidate."""

    def wrap(fn):
        STAGED[name] = QuerySpec(name, fn, oracle, doc or (fn.__doc__ or ""))
        return fn

    return wrap


# --- Kneser-Ney smoothed bigram probabilities -------------------------

_KN_TOP = 50  # emitted head: most frequent bigrams
# D = 3/4 (the Chen-Goodman-recommended constant); kept as the exact
# rational 3/4 so the whole probability is a ratio of integers:
#   p_kn(cur|prev) = (c - 3/4)/cl + (3/4 * n1r/cl) * (n1l/T)
#                  = ((4c - 3) * T + 3 * n1r * n1l) / (4 * cl * T)
# (c >= 1 on every emitted row, so the discount never clips at 0)


def _kn_sql() -> str:
    return f"""
    WITH tok AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')
               AS ts
      FROM documents
    ),
    inst AS (
      SELECT u.bgr.prev AS prev, u.bgr.cur AS cur
      FROM (
        SELECT list_transform(generate_series(1, len(ts) - 1),
                              i -> {{prev: ts[i], cur: ts[i+1]}}) AS bgs
        FROM tok WHERE len(ts) >= 2
      ) b, LATERAL (SELECT unnest(bgs) AS bgr) u
    ),
    big AS (
      SELECT prev, cur, CAST(COUNT(*) AS BIGINT) AS c2
      FROM inst GROUP BY prev, cur
    ),
    lft AS (
      SELECT prev, CAST(SUM(c2) AS HUGEINT) AS cl,
             CAST(COUNT(*) AS HUGEINT) AS n1r
      FROM big GROUP BY prev
    ),
    rgt AS (
      SELECT cur, CAST(COUNT(*) AS HUGEINT) AS n1l
      FROM big GROUP BY cur
    ),
    tot AS (SELECT CAST(COUNT(*) AS HUGEINT) AS t FROM big)
    SELECT b.prev, b.cur, b.c2 AS n_bigram,
           CAST((((4 * b.c2 - 3) * tot.t + 3 * lft.n1r * rgt.n1l)
                 * 1000000) // (4 * lft.cl * tot.t) AS BIGINT)
             AS pkn_ppm,
           CAST((rgt.n1l * 1000000) // tot.t AS BIGINT) AS cont_ppm
    FROM big b
    JOIN lft ON lft.prev = b.prev
    JOIN rgt ON rgt.cur = b.cur
    CROSS JOIN tot
    ORDER BY n_bigram DESC, b.prev, b.cur
    LIMIT {_KN_TOP}
    """


@stage(
    "kneser_ney_bigram_ppm",
    _kn_sql(),
    doc="Kneser-Ney smoothed bigram probabilities (D = 3/4 absolute "
    "discount + continuation-count backoff, Kneser & Ney 1995 / "
    "Chen & Goodman 1999) over the document corpus, emitted as exact "
    f"integer ppm; top-{_KN_TOP} bigrams by count with their "
    "continuation probability — the KenLM-style smoother behind "
    "CCNet-class quality filtering (extension).",
)
def kneser_ney_bigram_ppm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(prev, cur, n_bigram, pkn_ppm, cont_ppm), top-50 bigrams by
    count (prev, cur tiebreak).

    Scale shape: bigram instances build ROW-LOCALLY via shifted-slice
    zips (never a positional self-join — the doc_bigram_logprob
    lemma); the bigram-type frame is ONE map-side-combined hash
    aggregate, and every model statistic derives from THAT frame, not
    from raw instances — cl/n1r are a groupBy(prev), n1l a
    groupBy(cur), T a 1-row aggregate riding a scalar-broadcast
    crossJoin. The two marginal joins hash-partition on prev then cur
    (vocabulary-sized sides; AQE picks broadcast when they fit — not
    forced, since a 100 TB corpus's bigram vocabulary can exceed the
    driver). The head is TakeOrdered ({top} rows), never a global
    sort. Integer budget: the widest product is 4*c2*T*1e6 — through
    sf~100 (c2 ~ 1e11, T ~ 1e10) that is ~4e27, inside DECIMAL(38,0)
    on the Spark side and HUGEINT in the oracle; the emitted QUOTIENT
    is a ppm <= ~1e6, so the DECIMAL-DIV-to-BIGINT truncation is
    engine-identical (the ols_trend_fit rule: quotient must fit
    BIGINT, operands may exceed it).
    """.replace("{top}", str(_KN_TOP))
    docs = load(spark, sf_dir, "documents")
    ts = tokens(F.col("text"))
    n = F.size(ts)
    bigrams = F.zip_with(
        F.slice(ts, 1, n - 1),
        F.slice(ts, 2, n - 1),
        lambda a, b: F.struct(a.alias("prev"), b.alias("cur")),
    )
    inst = (
        docs.where(n >= 2)
        .select(F.explode(bigrams).alias("bg"))
        .select(F.col("bg.prev").alias("prev"), F.col("bg.cur").alias("cur"))
    )
    big = inst.groupBy("prev", "cur").agg(
        F.count(F.lit(1)).cast("bigint").alias("c2")
    )
    lft = big.groupBy("prev").agg(
        F.sum("c2").cast("decimal(38,0)").alias("cl"),
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n1r"),
    )
    rgt = big.groupBy("cur").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n1l")
    )
    tot = big.agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("t"))
    return (
        big.join(lft, "prev")
        .join(rgt, "cur")
        .crossJoin(F.broadcast(tot))
        .select(
            "prev",
            "cur",
            F.col("c2").alias("n_bigram"),
            F.expr(
                "CAST((((4 * c2 - 3) * t + 3 * n1r * n1l) * 1000000) "
                "DIV (4 * cl * t) AS BIGINT)"
            ).alias("pkn_ppm"),
            F.expr("CAST((n1l * 1000000) DIV t AS BIGINT)").alias(
                "cont_ppm"
            ),
        )
        .orderBy(F.desc("n_bigram"), F.asc("prev"), F.asc("cur"))
        .limit(_KN_TOP)
    )


# --- k-truss peeling trace --------------------------------------------

_KT_ROUNDS = 5  # fixed peel rounds; fixture converges inside them at
# both the pytest SF (sf0.001: empty by round 3 — the near-regular
# basket graph has no cohesive core above its mean support) and the
# driver SF (sf0.01: a 1127-edge core, stable from round 4)


def _kt_tri_sql(e: str) -> str:
    """Triangles of the id-oriented (u < v) edge set ``e`` via the
    wedge join (a < b < c exactly once)."""
    return (
        f"SELECT e1.u AS a, e1.v AS b, e2.v AS c "
        f"FROM {e} e1 JOIN {e} e2 ON e2.u = e1.v "
        f"JOIN {e} e3 ON e3.u = e1.u AND e3.v = e2.v"
    )


def _kt_sup_sql(t: str) -> str:
    """Per-edge support of the triangle set ``t`` (each triangle
    credits its three edges)."""
    return (
        f"SELECT u, v, COUNT(*) AS s FROM ("
        f"  SELECT a AS u, b AS v FROM {t}"
        f"  UNION ALL SELECT a, c FROM {t}"
        f"  UNION ALL SELECT b, c FROM {t}"
        f") roles GROUP BY u, v"
    )


def _kt_sql() -> str:
    """Unrolled peel: every CTE is MATERIALIZED (each edge/triangle
    level is referenced 3+ times — the r11 pagerank-oracle lesson:
    DuckDB re-expands multi-reference inlined CTEs)."""
    parts = [
        "WITH items AS MATERIALIZED (",
        "  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem",
        "),",
        "e0 AS MATERIALIZED (",
        "  SELECT DISTINCT a.p AS u, b.p AS v",
        "  FROM items a JOIN items b ON b.o = a.o AND b.p > a.p",
        "),",
    ]
    for r in range(_KT_ROUNDS + 1):
        parts.append(
            f"t{r} AS MATERIALIZED ({_kt_tri_sql(f'e{r}')}),"
        )
        if r < _KT_ROUNDS:
            parts.append(
                f"s{r} AS MATERIALIZED ({_kt_sup_sql(f't{r}')}),"
            )
        if r == 0:
            # corpus-adaptive truss bar: round-0's integer-mean edge
            # support (SUM(s) = 3 * n_triangles exactly)
            parts.append(
                "thr AS MATERIALIZED ("
                "  SELECT CASE WHEN COUNT(*) = 0 THEN 1"
                "  ELSE CAST(SUM(s) // COUNT(*) AS BIGINT) END AS thr"
                "  FROM s0"
                "),"
            )
        if r < _KT_ROUNDS:
            parts.append(
                f"e{r + 1} AS MATERIALIZED ("
                f"  SELECT e.u, e.v FROM e{r} e"
                f"  JOIN s{r} ON s{r}.u = e.u AND s{r}.v = e.v"
                f"  CROSS JOIN thr WHERE s{r}.s >= thr.thr"
                f"),"
            )
    # strip the trailing comma of the last CTE
    parts[-1] = parts[-1].rstrip(",")
    selects = []
    for r in range(_KT_ROUNDS + 1):
        removed = (
            "CAST(0 AS BIGINT)"
            if r == 0
            else f"CAST((SELECT COUNT(*) FROM e{r - 1}) "
            f"- (SELECT COUNT(*) FROM e{r}) AS BIGINT)"
        )
        selects.append(
            f"SELECT CAST({r} AS BIGINT) AS peel_round, "
            f"CAST((SELECT COUNT(*) FROM e{r}) AS BIGINT) AS n_edges, "
            f"{removed} AS n_removed, "
            f"CAST((SELECT COUNT(*) FROM t{r}) AS BIGINT) AS n_tri"
        )
    return (
        "\n".join(parts)
        + "\n"
        + "\nUNION ALL ".join(selects)
        + "\nORDER BY peel_round"
    )


@stage(
    "ktruss_peel_trace",
    _kt_sql(),
    doc="k-truss peeling over the order-item co-occurrence graph "
    "(Cohen 2008): every edge needs support >= k - 2 surviving "
    "triangles, below-bar edges peel simultaneously over "
    f"{_KT_ROUNDS} fixed rounds, with k - 2 derived in-plan as "
    "round-0's integer-mean edge support (a fixed literal cannot "
    "bite across scale factors); emits the per-round (edges, "
    "removals, surviving triangles) trace — the edge-cohesion "
    "analogue of the registered k-core rows and the standard "
    "community/boilerplate-cluster primitive (extension).",
)
def ktruss_peel_trace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(peel_round, n_edges, n_removed, n_tri), one row per round
    0..{rounds}.

    Scale shape: edges come from the basket-local pair expansion
    (``_basket_edges`` — bounded by max basket size, never
    data-by-data); each round computes per-edge support DIRECTLY as
    |N(u) ∩ N(v)| over UNDIRECTED adjacency — one symmetrize
    projection, one groupBy(x) list build, two edge-vs-vertex hash
    joins, and a row-local intersect SIZE — so no triangle row is
    ever exploded and no 3-role union aggregate runs (the first cut
    enumerated triangles per round and cost 27s at sf0.1; this form
    measures ~3x cheaper with bit-identical output, since every
    triangle is counted on exactly 3 edges: n_tri = SUM(s) DIV 3,
    exact). The graph SHRINKS every round, so round 0 dominates the
    wall. The peel bar (k - 2 = round-0 mean support over supported
    edges) is a 1-row aggregate, localCheckpointed once and
    crossJoined into every round's filter as a scalar broadcast —
    never a driver-side collect, and held fixed so the rounds are
    comparable. Each round's survivor frame is
    localCheckpoint-materialized: it feeds the next round's
    adjacency AND join sides, and without the boundary the lineage
    re-expands every upstream round per consumer. The trace rows are
    1-row count aggregates crossJoined (scalar broadcasts), unioned
    into one {rows}-row frame — one lazy DAG, no driver loop
    decision. Rounds are FIXED at {rounds} (the registered trace,
    converging on the fixture at both pytest and driver SFs — final
    round removes 0, asserted in tests); a true truss DECOMPOSITION
    needs data-dependent convergence, which at deployment is the
    bom/graph loop-termination pattern (bounded driver-side count
    per round) — documented, not silently claimed. At 100 TB the
    neighbor-list length is bounded by max degree — the skew
    refinement is the degree-capped adjacency documented on the
    triangles row (same plan, one extra degree join).
    """.replace("{rounds}", str(_KT_ROUNDS)).replace(
        "{rows}", str(_KT_ROUNDS + 1)
    )

    def _ck(df: DataFrame) -> DataFrame:
        return df.localCheckpoint(eager=False)

    cur = _basket_edges(spark, sf_dir, _ck)
    rows: list[DataFrame] = []
    prev_cnt: DataFrame | None = None
    thr: DataFrame | None = None
    for r in range(_KT_ROUNDS + 1):
        und = cur.select("u", "v").unionAll(
            cur.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        adj = und.groupBy("u").agg(F.collect_list("v").alias("nbrs"))
        au = adj.select(F.col("u").alias("au"), F.col("nbrs").alias("nu"))
        av = adj.select(F.col("u").alias("av"), F.col("nbrs").alias("nv"))
        # per-edge support, row-local: |N(u) ∩ N(v)| — every edge
        # endpoint has >= 1 neighbor, so both joins are inner
        sup = _ck(
            cur.join(au, cur["u"] == au["au"])
            .join(av, cur["v"] == av["av"])
            .select(
                "u",
                "v",
                F.size(F.array_intersect("nu", "nv")).alias("s"),
            )
        )
        # ONE stats pass per round: edge count and exact triangle
        # count (each triangle is counted on exactly its 3 edges)
        # fused into a single 1-row aggregate — separate aggregates
        # cost a scheduling round trip each, and with 6 rounds x 2
        # counts that overhead was a visible slice of the wall
        stats = sup.agg(
            F.count(F.lit(1)).cast("long").alias("n_edges"),
            F.expr(
                "CAST(COALESCE(SUM(s), 0) DIV 3 AS BIGINT)"
            ).alias("n_tri"),
        )
        removed = (
            F.lit(0).cast("long")
            if r == 0
            else (F.col("prev_edges") - F.col("n_edges")).cast("long")
        )
        row = stats
        if prev_cnt is not None:
            row = row.crossJoin(
                prev_cnt.select(F.col("n_edges").alias("prev_edges"))
            )
        rows.append(
            row.select(
                F.lit(r).cast("long").alias("peel_round"),
                "n_edges",
                removed.alias("n_removed"),
                "n_tri",
            )
        )
        prev_cnt = stats
        if r < _KT_ROUNDS:
            if thr is None:
                # round-0 mean support over SUPPORTED edges (the
                # oracle's s0 frame excludes zero-support edges, so
                # the mean divides by COUNT of s > 0); 1-row frame,
                # checkpointed so 5 consumers don't re-aggregate
                thr = _ck(
                    sup.agg(
                        F.expr(
                            "CASE WHEN COUNT(CASE WHEN s > 0 THEN 1 "
                            "END) = 0 THEN 1 "
                            "ELSE CAST(SUM(s) DIV COUNT(CASE WHEN "
                            "s > 0 THEN 1 END) AS BIGINT) END"
                        ).alias("thr")
                    )
                )
            # the survivor frame is a cheap filter over the ALREADY
            # checkpointed sup — checkpointing it again would write
            # every survivor row a second time for no lineage gain
            cur = (
                sup.crossJoin(F.broadcast(thr))
                .where(F.col("s") >= F.col("thr"))
                .select("u", "v")
            )
    out = rows[0]
    for fr in rows[1:]:
        out = out.unionByName(fr)
    return out.orderBy("peel_round")


# --- perceptual-hash (aHash) media near-dup ---------------------------

_PH_MAX_HAM = 3  # verify bar; matches the 4-band pigeonhole guarantee


def _ph_sql() -> str:
    bands = ",\n      ".join(
        f"CAST(list_sum(list_transform(range(0, 16), j -> "
        f"CASE WHEN 64 * sm[{k} + 4 * j + 1] > tot "
        f"THEN (1 << j) ELSE 0 END)) AS BIGINT) AS b{k}"
        for k in range(4)
    )
    cands = "\n      UNION ALL ".join(
        f"SELECT a.media_id AS ma, c.media_id AS mb FROM bands a "
        f"JOIN bands c ON a.b{k} = c.b{k} AND a.media_id < c.media_id"
        for k in range(4)
    )
    ham = " + ".join(f"bit_count(xor(x.b{k}, y.b{k}))" for k in range(4))
    return f"""
    WITH m AS (
      SELECT doc_id AS media_id, text,
             octet_length(encode(text)) AS n
      FROM documents WHERE octet_length(encode(text)) > 0
    ),
    s AS (
      SELECT media_id, list_transform(range(0, 64),
        i -> ord(substr(text, 1 + CAST(least(5 * i, n - 1) AS INT), 1)))
        AS sm
      FROM m
    ),
    h AS (SELECT media_id, sm, list_sum(sm) AS tot FROM s),
    bands AS (
      SELECT media_id,
      {bands}
      FROM h
    ),
    cand AS (
      SELECT DISTINCT ma, mb FROM (
      {cands}
      ) u
    ),
    ver AS (
      SELECT cand.ma, cand.mb, CAST({ham} AS BIGINT) AS hamming
      FROM cand JOIN bands x ON x.media_id = cand.ma
                JOIN bands y ON y.media_id = cand.mb
    )
    SELECT ma AS media_id_a, mb AS media_id_b, hamming
    FROM ver WHERE hamming <= {_PH_MAX_HAM}
    ORDER BY media_id_a, media_id_b
    """


@stage(
    "media_ahash_near_dup",
    _ph_sql(),
    doc="Perceptual-hash near-duplicate detection over the media "
    "catalog: 64-bit average hash (aHash) per payload via the "
    "Arrow-batched multimodal operator, banded into 4 x 16-bit keys "
    "for Hamming-distance LSH (pigeonhole: any pair within Hamming "
    f"{_PH_MAX_HAM} shares >= 1 exact band), exact bit_count verify "
    "— the standard image-dedup shape, codec-free fake decode, real "
    "everything-else (multimodal extension).",
)
def media_ahash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(media_id_a, media_id_b, hamming), every pair within Hamming
    distance {ham} of each other, ordered.

    Scale shape: the hash is ONE Arrow-batched mapInPandas pass
    (``operators/multimodal.ahash_bands`` — payload bytes are read
    and projected away in the same stage, never shuffled; the fake
    decode is the only faked step, see the operator docstring); the
    checkpointed 5-column band frame is all that ever joins.
    Candidates come from 4 band-keyed equi self-joins (the
    minhash-LSH banding shape: a pair within Hamming {ham} of 64
    bits MUST agree exactly on >= 1 of the 4 16-bit bands —
    pigeonhole, so recall is 100% by construction, asserted against
    brute force in tests) unioned + DISTINCT, then ONE exact verify
    join computes bit_count(b XOR b) over the 4 bands and filters
    > {ham}. Nothing is ever all-pairs: cost is sum of squared
    band-bucket occupancies. Skew/selectivity note: 16-bit bands
    give 65k buckets — selective for real image hashes; on THIS
    text-derived fixture the shared document prefixes collide ~18%
    of all pairs into candidates (measured), which the verify join
    prunes exactly; at deployment scale the band width is the
    cost/recall knob exactly as in the MinHash family
    (``lsh_band_tuning_costs``), widening bands or multi-probing as
    N grows. All outputs integers.
    """.replace("{ham}", str(_PH_MAX_HAM))
    from ..operators.multimodal import (
        ahash_bands,
        synth_media_from_documents,
    )

    media = synth_media_from_documents(load(spark, sf_dir, "documents"))
    bands = ahash_bands(media).localCheckpoint(eager=False)
    a = bands.select(
        F.col("media_id").alias("ma"),
        *[F.col(f"b{k}").alias(f"a{k}") for k in range(4)],
    )
    c = bands.select(
        F.col("media_id").alias("mb"),
        *[F.col(f"b{k}").alias(f"c{k}") for k in range(4)],
    )
    cand = None
    for k in range(4):
        pairs_k = a.join(
            c, (F.col(f"a{k}") == F.col(f"c{k}")) & (F.col("ma") < F.col("mb"))
        ).select("ma", "mb")
        cand = pairs_k if cand is None else cand.unionAll(pairs_k)
    cand = cand.distinct()
    x = bands.select(
        F.col("media_id").alias("ma"),
        *[F.col(f"b{k}").alias(f"x{k}") for k in range(4)],
    )
    y = bands.select(
        F.col("media_id").alias("mb"),
        *[F.col(f"b{k}").alias(f"y{k}") for k in range(4)],
    )
    ham = sum(
        F.expr(f"bit_count(x{k} ^ y{k})") for k in range(4)
    ).cast("long")
    return (
        cand.join(x, "ma")
        .join(y, "mb")
        .select(
            F.col("ma").alias("media_id_a"),
            F.col("mb").alias("media_id_b"),
            ham.alias("hamming"),
        )
        .where(F.col("hamming") <= _PH_MAX_HAM)
        .orderBy("media_id_a", "media_id_b")
    )


# --- HyperLogLog distinct sketch with register-merge union ------------

_HLL_M = 64  # registers (p = 6); sigma = 1.04/sqrt(64) = 13%
_HLL_CAP = 55  # rho for w = 0 (w has 54 payload bits, so rho <= 54 else)
# alpha_64 = 0.7213/(1 + 1.079/64) = 0.709379..., carried as the ppm
# rational 709379/1e6 so the estimate is one exact integer division:
#   E = alpha * m^2 / sum_j 2^-M_j
#     = (709379 * m^2 * 2^CAP) // (1e6 * sum_j 2^(CAP - M_j))
_HLL_ALPHA_NUM = 709379 * _HLL_M * _HLL_M * (1 << _HLL_CAP)
_HLL_BOUND_PPM = 390_000  # 3 sigma for m = 64


def _hll_sql() -> str:
    m, cap = _HLL_M, _HLL_CAP
    return f"""
    WITH b AS (
      SELECT o_orderstatus AS set_key, o_custkey,
             CAST('0x' || substr(md5('hll:' || CAST(o_custkey AS VARCHAR)),
                  1, 15) AS BIGINT) AS h
      FROM orders
    ),
    r AS (
      SELECT set_key, h % {m} AS reg,
             CASE WHEN (h // {m}) = 0 THEN {cap}
                  ELSE CAST(log2((h // {m}) & -(h // {m})) AS INT) + 1
             END AS rho
      FROM b
    ),
    regs AS (SELECT set_key, reg, MAX(rho) AS m_j FROM r GROUP BY 1, 2),
    au AS (
      SELECT * FROM regs
      UNION ALL
      SELECT 'ALL' AS set_key, reg, MAX(m_j) AS m_j FROM regs GROUP BY 2
    ),
    sk AS (
      SELECT set_key,
             CAST({m} - COUNT(*) AS BIGINT) AS v_zero,
             CAST(SUM(CAST(1 AS BIGINT) << ({cap} - m_j))
                  + ({m} - COUNT(*)) * (CAST(1 AS BIGINT) << {cap})
                  AS BIGINT) AS s
      FROM au GROUP BY 1
    ),
    ex AS (
      SELECT set_key, COUNT(DISTINCT o_custkey) AS n_exact FROM b GROUP BY 1
      UNION ALL SELECT 'ALL', COUNT(DISTINCT o_custkey) FROM b
    ),
    est AS (
      SELECT sk.set_key, v_zero, CAST(ex.n_exact AS BIGINT) AS n_exact,
             CAST({_HLL_ALPHA_NUM}::HUGEINT
                  // (s::HUGEINT * 1000000) AS BIGINT) AS n_est
      FROM sk JOIN ex USING (set_key)
    )
    SELECT set_key, v_zero, n_exact, n_est,
           CAST(abs(n_est - n_exact)::HUGEINT * 1000000 // n_exact
                AS BIGINT) AS err_ppm,
           CAST(abs(n_est - n_exact)::HUGEINT * 1000000 // n_exact
                <= {_HLL_BOUND_PPM} AS BOOLEAN) AS within_bound
    FROM est ORDER BY set_key
    """


@stage(
    "hll_distinct_union",
    _hll_sql(),
    doc=f"HyperLogLog register-MERGE union (m = {_HLL_M}): per-status "
    "sketches over overlapping customer sets plus the register-wise-"
    "max merged row — the union companion to the single-set "
    "hll_distinct_flags (r9), as kmv_set_overlap is to "
    "distinct_kmv_orders; union != sum because the sets overlap. "
    "Pure-integer estimate via the ppm-rational alpha (Flajolet et "
    "al. 2007; extension).",
)
def hll_distinct_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(set_key, v_zero, n_exact, n_est, err_ppm, within_bound) per
    order status plus the 'ALL' union row.

    Family note: this is the register-MERGE (union) companion to the
    registered single-set ``hll_distinct_flags`` (plans/staged_r9.py,
    r9) — the same split the KMV family makes between
    ``distinct_kmv_orders`` (one set) and ``kmv_set_overlap`` (set
    algebra from sketches). What is new here: the union row computed
    from per-set registers (the r9 row asserts mergeability in prose;
    this row exercises and oracle-checks it across overlapping sets),
    the trailing-zeros rank, and the all-integer estimate below.

    The sketch: h = 60 uniform bits from the seeded-md5 convention
    (the KMV family's engine-replayable hash), register = h mod m,
    rank rho = trailing-zero count of the remaining 54 bits + 1 (the
    Flajolet-Martin rank; identical geometric law P(rho >= k) =
    2^(1-k) as HLL's leading-zero form, and exact cross-engine:
    log2(w & -w) is a power of two, so the double is the integer).
    Register state M_j = max(rho). The UNION row is register-wise
    MAX over the per-status sketches — mergeability is the point:
    at 100 TB, per-partition 64-byte sketches combine without
    re-scanning (and the statuses' customer sets overlap, so the
    union estimate is NOT the sum — the merged registers handle
    that for free). The estimate is exact integer arithmetic on
    both engines: S = sum 2^(CAP - M_j) (<= m * 2^CAP < 2^63, no
    overflow), E = alpha_num DIV (1e6 * S) as one DECIMAL(38,0)
    division whose quotient is BIGINT-bounded by construction.
    Small-range note: the linear-counting arm (Flajolet's V > 0
    correction) is deliberately omitted — v_zero is emitted so the
    regime is observable, and the raw estimator is the
    cross-engine-exact contract being tested (at sf0.001, v_zero =
    8-9 and the raw estimate still lands within 3.5%; at sf0.01+
    every register is hit).

    Scale shape: one scan -> map-side-combinable MAX into m rows
    per set (the whole shuffle is <= 4 * 64 rows); the exact
    companion is a separate distinct pass that disappears at
    deployment (eval-only). No window, no join bigger than 4 rows.
    """
    m, cap = _HLL_M, _HLL_CAP
    orders = load(spark, sf_dir, "orders")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("hll:"), F.col("o_custkey").cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    base = orders.select(
        F.col("o_orderstatus").alias("set_key"), "o_custkey", h.alias("h")
    )
    rho = F.when(F.col("w") == 0, F.lit(cap)).otherwise(
        F.log2(F.expr("w & -w")).cast("int") + 1
    )
    regs = (
        base.select(
            "set_key",
            F.pmod("h", F.lit(m)).alias("reg"),
            F.shiftright("h", 6).alias("w"),
        )
        .select("set_key", "reg", rho.alias("rho"))
        .groupBy("set_key", "reg")
        .agg(F.max("rho").alias("m_j"))
    )
    merged = (
        regs.groupBy("reg")
        .agg(F.max("m_j").alias("m_j"))
        .select(F.lit("ALL").alias("set_key"), "reg", "m_j")
    )
    sk = (
        regs.unionByName(merged)
        .groupBy("set_key")
        .agg(
            F.sum(
                F.expr(f"shiftleft(CAST(1 AS BIGINT), {cap} - m_j)")
            ).alias("s_present"),
            F.count(F.lit(1)).alias("nreg"),
        )
        .select(
            "set_key",
            (F.lit(m) - F.col("nreg")).cast("long").alias("v_zero"),
            (
                F.col("s_present")
                + (F.lit(m) - F.col("nreg")) * F.lit(1 << cap)
            ).alias("s"),
        )
    )
    est = sk.withColumn(
        "n_est",
        F.expr(
            f"CAST(CAST({_HLL_ALPHA_NUM} AS DECIMAL(38,0)) "
            f"DIV (CAST(s AS DECIMAL(38,0)) * 1000000) AS BIGINT)"
        ),
    )
    exact = (
        base.select("set_key", "o_custkey")
        .distinct()
        .groupBy("set_key")
        .agg(F.count(F.lit(1)).alias("n_exact"))
        .unionByName(
            base.select("o_custkey")
            .distinct()
            .agg(F.count(F.lit(1)).alias("n_exact"))
            .select(F.lit("ALL").alias("set_key"), "n_exact")
        )
    )
    return (
        est.join(exact, "set_key")
        .select(
            "set_key",
            "v_zero",
            "n_exact",
            "n_est",
            F.expr(
                "CAST(CAST(abs(n_est - n_exact) AS DECIMAL(38,0)) "
                "* 1000000 DIV n_exact AS BIGINT)"
            ).alias("err_ppm"),
        )
        .withColumn("within_bound", F.col("err_ppm") <= _HLL_BOUND_PPM)
        .orderBy("set_key")
    )


# --- HyperBall / ANF: neighborhood function via per-vertex HLL --------

_HB_M = 16  # registers per vertex (p = 4); per-vertex sigma = 26%
_HB_CAP = 57  # rho for w = 0 (w has 56 payload bits, rho <= 57 else)
_HB_ROUNDS = 3  # fixed merge rounds -> N(0..3)
# alpha_16 = 0.673 (Flajolet et al. 2007, m = 16), as the ppm
# rational 673000/1e6 -> one exact integer division per vertex:
#   E_v = (673000 * m^2 * 2^CAP) // (1e6 * sum_j 2^(CAP - M_j))
_HB_ALPHA_NUM = 673000 * _HB_M * _HB_M * (1 << _HB_CAP)
_HB_COLS = [f"m{i}" for i in range(_HB_M)]


def _hb_sql() -> str:
    m, cap = _HB_M, _HB_CAP
    mcase = ",\n             ".join(
        f"CAST(CASE WHEN h % {m} = {i} THEN "
        f"CASE WHEN (h // {m}) = 0 THEN {cap} "
        f"ELSE CAST(log2((h // {m}) & -(h // {m})) AS INT) + 1 END "
        f"ELSE 0 END AS INT) AS m{i}"
        for i in range(m)
    )
    maxes = ", ".join(f"MAX(m{i}) AS m{i}" for i in range(m))
    cols = ", ".join(_HB_COLS)
    ssum = " + ".join(
        f"(CAST(1 AS BIGINT) << ({cap} - m{i}))" for i in range(m)
    )
    esel = (
        f"CAST({_HB_ALPHA_NUM}::HUGEINT "
        f"// (({ssum})::HUGEINT * 1000000) AS BIGINT)"
    )
    parts = [
        f"""
    WITH items AS MATERIALIZED (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ),
    e0 AS MATERIALIZED (
      SELECT DISTINCT a.p AS u, b.p AS v
      FROM items a JOIN items b ON b.o = a.o AND b.p > a.p
    ),
    und AS MATERIALIZED (
      SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0
    ),
    verts AS MATERIALIZED (SELECT DISTINCT u AS vertex FROM und),
    s0 AS MATERIALIZED (
      SELECT vertex,
             {mcase}
      FROM (
        SELECT vertex,
               CAST('0x' || substr(md5('hb:' || CAST(vertex AS VARCHAR)),
                    1, 15) AS BIGINT) AS h
        FROM verts) hv
    ),"""
    ]
    for r in range(1, _HB_ROUNDS + 1):
        parts.append(
            f"""
    s{r} AS MATERIALIZED (
      SELECT vertex, {maxes} FROM (
        SELECT und.u AS vertex, {cols}
        FROM und JOIN s{r - 1} ON s{r - 1}.vertex = und.v
        UNION ALL SELECT vertex, {cols} FROM s{r - 1}
      ) z GROUP BY vertex
    ),"""
        )
    parts[-1] = parts[-1].rstrip().rstrip(",")
    sel = "\n    UNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS radius, "
        f"CAST(SUM(ev) AS BIGINT) AS sum_reach_est "
        f"FROM (SELECT {esel} AS ev FROM s{r}) q{r}"
        for r in range(_HB_ROUNDS + 1)
    )
    return "".join(parts) + "\n    " + sel + "\n    ORDER BY radius"


@stage(
    "hyperball_neighborhood",
    _hb_sql(),
    doc=f"HyperBall / ANF neighborhood function over the item "
    f"co-occurrence graph (Palmer et al. 2002; Boldi & Vigna 2013): "
    f"each vertex carries an HLL sketch (m = {_HB_M}) of its ball, "
    f"merged register-wise-MAX along edges for {_HB_ROUNDS} rounds — "
    f"N(r) = sum of per-vertex ball-size estimates, the "
    f"centrality/diameter primitive exact BFS cannot afford at scale "
    f"(extension).",
)
def hyperball_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(radius, sum_reach_est), one row per radius 0..{rounds}: the
    ANF/HyperBall neighborhood function N(r) = sum over vertices of
    the estimated |ball(v, r)|.

    The composition this row exists to demonstrate: per-VERTEX HLL
    register state (the ``hll_distinct_union`` machinery) merged
    along EDGES (the graph family's bounded-round iteration). Exact
    BFS needs O(n * reachable-pairs) work; HyperBall keeps {m}
    registers per vertex and each round is ONE edge-vs-state hash
    join plus ONE map-side-combinable groupBy(vertex) with {m} MAX
    aggregates — register state never explodes per edge (the {m}
    registers travel as {m} INT columns, so a round shuffles at most
    n * {m} combined cells, not E * {m} rows). Round frames
    localCheckpoint (each feeds the next round's join AND the trace
    row — the bom/graph lineage convention); trace rows are 1-row
    aggregates unioned into one {rows}-row frame, one lazy DAG.

    Exactness contract: every statistic is integer arithmetic shared
    bit-for-bit with the oracle — the seeded-md5 hash, trailing-zeros
    rank (log2 of a power of two is exact in doubles), register MAX
    merge, and the per-vertex estimate as one DECIMAL(38,0) division
    (quotient <= ~1.6e18, BIGINT-safe; N(r) <= n * max-ball ~ n^2,
    BIGINT-safe through ~3e9 vertices). Accuracy (asserted in tests
    vs exact Python BFS at the pytest SF): r >= 1 lands within the
    summed-sketch error envelope (~5% measured — per-vertex sigma =
    26% but the n per-vertex errors partially cancel in the sum);
    the r = 0 row is the raw estimator's documented small-range
    regime (singleton sets, V = {m} - 1 of {m} registers empty:
    ~11x high, deterministically — the linear-counting correction is
    deliberately omitted for cross-engine exactness, same decision
    as ``hll_distinct_union``), so radius 0 is the calibration row,
    not an estimate. Rounds are FIXED at {rounds} (the fixture
    saturates: N(3) = N(2) at the pytest SF, observable in the
    trace); a diameter sweep runs more rounds with the bom/graph
    loop-termination pattern at deployment.
    """.replace("{rounds}", str(_HB_ROUNDS)).replace(
        "{m}", str(_HB_M)
    ).replace("{rows}", str(_HB_ROUNDS + 1))
    m, cap = _HB_M, _HB_CAP

    def _ck(df: DataFrame) -> DataFrame:
        return df.localCheckpoint(eager=False)

    edges = _basket_edges(spark, sf_dir, _ck)
    und = _ck(
        edges.select("u", "v").unionAll(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
    )
    verts = und.select(F.col("u").alias("vertex")).distinct()
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("hb:"), F.col("vertex").cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    rho = F.when(F.col("w") == 0, F.lit(cap)).otherwise(
        F.log2(F.expr("w & -w")).cast("int") + 1
    )
    st = _ck(
        verts.select("vertex", h.alias("h"))
        .select(
            "vertex",
            F.pmod("h", F.lit(m)).alias("reg"),
            F.shiftright("h", 4).alias("w"),
        )
        .select("vertex", "reg", rho.alias("rho"))
        .select(
            "vertex",
            *[
                F.when(F.col("reg") == i, F.col("rho"))
                .otherwise(F.lit(0))
                .cast("int")
                .alias(f"m{i}")
                for i in range(m)
            ],
        )
    )

    def est_sum(stdf: DataFrame, r: int) -> DataFrame:
        s = " + ".join(
            f"shiftleft(CAST(1 AS BIGINT), {cap} - m{i})" for i in range(m)
        )
        e = (
            f"CAST(CAST({_HB_ALPHA_NUM} AS DECIMAL(38,0)) DIV "
            f"(CAST(({s}) AS DECIMAL(38,0)) * 1000000) AS BIGINT)"
        )
        return (
            stdf.select(F.expr(e).alias("ev"))
            .agg(F.sum("ev").cast("long").alias("sum_reach_est"))
            .select(
                F.lit(r).cast("long").alias("radius"), "sum_reach_est"
            )
        )

    rows = [est_sum(st, 0)]
    for r in range(1, _HB_ROUNDS + 1):
        nb = und.join(st, und["v"] == st["vertex"]).select(
            und["u"].alias("vertex"), *_HB_COLS
        )
        st = _ck(
            nb.unionByName(st.select("vertex", *_HB_COLS))
            .groupBy("vertex")
            .agg(*[F.max(c).alias(c) for c in _HB_COLS])
        )
        rows.append(est_sum(st, r))
    out = rows[0]
    for fr in rows[1:]:
        out = out.unionByName(fr)
    return out.orderBy("radius")


# --- local clustering coefficients ------------------------------------

_CC_TOP = 1000  # emitted head: most clustered vertices


def _cc_sql() -> str:
    return f"""
    WITH items AS MATERIALIZED (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ),
    e0 AS MATERIALIZED (
      SELECT DISTINCT a.p AS u, b.p AS v
      FROM items a JOIN items b ON b.o = a.o AND b.p > a.p
    ),
    t AS MATERIALIZED (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM e0 e1 JOIN e0 e2 ON e2.u = e1.v
      JOIN e0 e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    s AS MATERIALIZED (
      SELECT u, v, COUNT(*) AS s FROM (
        SELECT a AS u, b AS v FROM t
        UNION ALL SELECT a, c FROM t
        UNION ALL SELECT b, c FROM t
      ) roles GROUP BY u, v
    ),
    se AS (
      SELECT e0.u, e0.v, COALESCE(s.s, 0) AS s
      FROM e0 LEFT JOIN s ON s.u = e0.u AND s.v = e0.v
    ),
    pv AS (
      SELECT u AS vertex, CAST(COUNT(*) AS BIGINT) AS degree,
             CAST(SUM(s) AS BIGINT) AS ss
      FROM (SELECT u, s FROM se UNION ALL SELECT v, s FROM se) z
      GROUP BY u
    )
    SELECT vertex, degree, CAST(ss // 2 AS BIGINT) AS n_tri,
           CAST(ss * 1000000 // (degree * (degree - 1)) AS BIGINT)
             AS cc_ppm
    FROM pv WHERE degree >= 2
    ORDER BY cc_ppm DESC, vertex LIMIT {_CC_TOP}
    """


@stage(
    "local_clustering_coeff",
    _cc_sql(),
    doc="Local clustering coefficients over the item co-occurrence "
    "graph (Watts & Strogatz 1998): per-vertex triangle density "
    f"2*tri / (deg*(deg-1)) as exact integer ppm, top-{_CC_TOP} most "
    "clustered vertices — the canonical cohesion metric completing "
    "the graph family next to triangles / k-core / k-truss "
    "(extension).",
)
def local_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vertex, degree, n_tri, cc_ppm), top-{top} by cc_ppm (vertex
    tiebreak — a total order, so the head is deterministic).

    Scale shape: the per-edge triangle support s = |N(u) ∩ N(v)| is
    the ktruss round-0 machinery verbatim — one adjacency build, two
    vertex-keyed hash joins, a row-local intersect SIZE; no triangle
    row is ever exploded. Per-vertex triangles then come from the
    identity tri(v) = (sum of s over edges at v) DIV 2 (each
    triangle at v contributes to exactly 2 incident edges — the sum
    is always even; property-tested), so the reduction is ONE
    symmetrize projection + ONE map-side-combinable groupBy(vertex)
    carrying (count, sum). cc_ppm = ss * 1e6 DIV (deg * (deg - 1))
    uses ss = 2 * tri directly — no doubling round trip. The head is
    TakeOrdered ({top} rows), never a global sort; degree < 2
    vertices are excluded (undefined denominator). At 100 TB the
    neighbor-list bound is max degree — the skew refinement is the
    degree-capped adjacency documented on the triangles row. All
    outputs BIGINT.
    """.replace("{top}", str(_CC_TOP))

    def _ck(df: DataFrame) -> DataFrame:
        return df.localCheckpoint(eager=False)

    edges = _basket_edges(spark, sf_dir, _ck)
    und = edges.select("u", "v").unionAll(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    adj = und.groupBy("u").agg(F.collect_list("v").alias("nbrs"))
    au = adj.select(F.col("u").alias("au"), F.col("nbrs").alias("nu"))
    av = adj.select(F.col("u").alias("av"), F.col("nbrs").alias("nv"))
    sup = _ck(
        edges.join(au, edges["u"] == au["au"])
        .join(av, edges["v"] == av["av"])
        .select(
            "u", "v", F.size(F.array_intersect("nu", "nv")).alias("s")
        )
    )
    sund = sup.select("u", "s").unionAll(
        sup.select(F.col("v").alias("u"), "s")
    )
    per_v = sund.groupBy("u").agg(
        F.count(F.lit(1)).cast("long").alias("degree"),
        F.sum("s").cast("long").alias("ss"),
    )
    return (
        per_v.where(F.col("degree") >= 2)
        .select(
            F.col("u").alias("vertex"),
            "degree",
            F.expr("CAST(ss DIV 2 AS BIGINT)").alias("n_tri"),
            F.expr(
                "CAST(ss * 1000000 DIV (degree * (degree - 1)) "
                "AS BIGINT)"
            ).alias("cc_ppm"),
        )
        .orderBy(F.desc("cc_ppm"), F.asc("vertex"))
        .limit(_CC_TOP)
    )
