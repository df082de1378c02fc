"""Link-graph frontier prioritization: integer fixed-point PageRank.

The reference schedules strictly FIFO-by-discovery (``ORDER BY id ASC
LIMIT chunk`` — rmq/commands/producer.py:196-211) with ``priority`` a
dormant column (mixins/mysql_priority_attempt.py:6-8). A web-scale
frontier wants that priority column *fed*: importance-ordered crawling
(PageRank — Brin/Page'98; OPIC — Abiteboul et al., WWW'03 — is the
online variant of the same cash-flow idea) fetches high-value pages
first and is the classic producer of the (priority, depth,
discovered_at) claim key the north rule names. This module computes
PageRank over the discovered link graph; the result joins onto the
frontier as its ``priority`` column.

Determinism contract (what makes this oracle-able): ranks are held in
**int64 fixed-point units** (``unit`` per node initially), every
per-edge contribution is computed with integer multiply + integer
``div``, and in-flows are summed as int64 — integer addition is
associative/commutative, so the result is bit-identical regardless of
partitioning, task order, or engine (no float-summation-order drift
anywhere). The variant implemented is the standard "weakly
preferential" simplification: each iteration
``r'(v) = unit*(100-d)/100 + Σ_{u→v} (r(u)*d) div (100*outdeg(u))``
with dangling-node mass dropped (a node with no out-edges absorbs its
rank; fine for *prioritization*, where only the ordering matters) and
``div`` flooring each edge's contribution (the lost sub-unit remainders
are < outdeg per node per iteration — noise at unit=1e6).

Scale shape (10^10-edge graph): per iteration exactly TWO shuffles —
ranks ⋈ edges on ``src`` (sort-merge at scale; ``edges`` is pre-joined
with out-degrees ONCE and persisted, so the loop never recomputes
degrees) and the ``groupBy(dst).sum`` in-flow aggregate, which is an
int64 sum with map-side partial aggregation, so a hot dst (a popular
page with 10^8 in-links) combines locally before the exchange — the
skew-resistant shape. Rank rows are 16 bytes (node, int64); payload
bytes never enter these shuffles (SURVEY.md §4 'binary-heavy
shuffles').
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_UNIT = 1_000_000


def pagerank_units(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    iters: int = 3,
    damping_pct: int = 85,
    unit: int = DEFAULT_UNIT,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, rank_units) after ``iters`` integer fixed-point PageRank
    iterations over ``edges``. ``nodes`` defaults to distinct(src∪dst).
    ``damping_pct`` is the damping factor in percent (85 = the classic
    0.85) so the teleport term ``unit*(100-d) div 100`` stays integral.
    """
    if not 0 <= damping_pct <= 100:
        raise ValueError("damping_pct must be in [0, 100]")
    if iters < 0:
        raise ValueError("iters must be >= 0")
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    if nodes is None:
        nodes = e.select(F.col("src").alias("node")).union(
            e.select(F.col("dst").alias("node"))
        ).distinct()
    else:
        nodes = nodes.select(F.col(nodes.columns[0]).alias("node"))
    deg = e.groupBy("src").agg(F.count("*").alias("_deg"))
    # out-degrees joined ONCE; the loop reuses this persisted edge set
    ed = e.join(deg, "src").persist()
    teleport = (unit * (100 - damping_pct)) // 100
    ranks = nodes.select("node", F.lit(int(unit)).cast("long").alias("rank_units"))
    contrib = F.expr(f"(rank_units * {int(damping_pct)}) div (100 * _deg)")
    for _ in range(iters):
        flow = (
            ed.join(ranks.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"), contrib.alias("_c"))
            .groupBy("node")
            .agg(F.sum("_c").alias("_in"))  # int64 sum: order-free, exact
        )
        ranks = nodes.join(flow, "node", "left").select(
            "node",
            (F.lit(teleport) + F.coalesce(F.col("_in"), F.lit(0))).cast("long").alias(
                "rank_units"
            ),
        )
    ed.unpersist(blocking=False)
    return ranks


def opic_units(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    iters: int = 3,
    unit: int = DEFAULT_UNIT,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, cash_units, hist_units, opic_units) after ``iters``
    synchronous OPIC rounds (Abiteboul/Preda/Cobena, WWW'03 — On-line
    Page Importance Computation, the crawl-scheduling importance
    estimator built for exactly this frontier: unlike PageRank it
    needs no convergence before its partial scores are useful).

    Cash-flow semantics, batch-synchronous: every node starts with
    ``unit`` cash and zero history; each round every node (a) banks its
    cash into history (``hist += cash`` — the record of total
    importance mass that has passed through the page) and (b)
    distributes that cash equally along its out-edges (each edge gets
    ``cash div outdeg``); new cash = the int64 sum of inflows. The
    importance estimate is ``opic = hist + cash``. Dangling-node cash
    is banked but not redistributed (the original's virtual page is
    dropped — same "weakly preferential" simplification as
    :func:`pagerank_units`, fine for *ordering*), and per-edge floor
    remainders (< outdeg per node per round) vanish as noise at
    unit=1e6.

    Determinism contract: identical to :func:`pagerank_units` — all
    state is int64, per-edge contributions use integer ``div``, inflow
    is an order-free int64 sum, so results are bit-identical across
    partitionings/engines.

    Scale shape (10^10 edges): per round exactly TWO shuffles — the
    cash ⋈ edges join on ``src`` (edges pre-joined with out-degrees
    ONCE and persisted) and the dst-keyed int64 sum with map-side
    partial aggregation (hot pages combine locally before the
    exchange). State rows are 24 bytes; history accumulates row-local.
    """
    if iters < 0:
        raise ValueError("iters must be >= 0")
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    if nodes is None:
        nodes = e.select(F.col("src").alias("node")).union(
            e.select(F.col("dst").alias("node"))
        ).distinct()
    else:
        nodes = nodes.select(F.col(nodes.columns[0]).alias("node"))
    deg = e.groupBy("src").agg(F.count("*").alias("_deg"))
    ed = e.join(deg, "src").persist()
    state = nodes.select(
        "node",
        F.lit(int(unit)).cast("long").alias("cash_units"),
        F.lit(0).cast("long").alias("hist_units"),
    )
    for _ in range(iters):
        flow = (
            ed.join(
                state.select(F.col("node").alias("src"), "cash_units"), "src"
            )
            .select(
                F.col("dst").alias("node"),
                F.expr("cash_units div _deg").alias("_c"),
            )
            .groupBy("node")
            .agg(F.sum("_c").alias("_in"))  # int64 sum: order-free, exact
        )
        state = state.join(flow, "node", "left").select(
            "node",
            F.coalesce(F.col("_in"), F.lit(0)).cast("long").alias("cash_units"),
            (F.col("hist_units") + F.col("cash_units")).cast("long").alias(
                "hist_units"
            ),
        )
    ed.unpersist(blocking=False)
    return state.withColumn(
        "opic_units",
        (F.col("cash_units") + F.col("hist_units")).cast("long"),
    )


def pagerank_priority(
    frontier: DataFrame,
    edges: DataFrame,
    iters: int = 3,
    key_col: str = "url_hash",
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Frontier rows + an importance-derived ``priority`` column: LOWER
    priority value = claimed earlier (CLAIM_ORDER sorts ascending), so
    priority = -rank_units. Unranked URLs (not yet in the link graph)
    get priority 0 — behind every ranked page, preserving FIFO among
    themselves via the (depth, discovered_seq) tail of the claim key."""
    ranks = pagerank_units(edges, iters=iters, src_col=src_col, dst_col=dst_col)
    return (
        frontier.join(
            ranks.withColumnRenamed("node", key_col), key_col, "left"
        )
        .withColumn(
            "priority",
            F.coalesce(-F.col("rank_units"), F.lit(0)).cast("long"),
        )
        .drop("rank_units")
    )


def focused_priority_boost(
    frontier: DataFrame,
    pages: DataFrame,
    terms: list[str],
    boost_milli: int = 1000,
    url_col: str = "url",
    priority_col: str = "priority",
    page_url_col: str = "url",
    body_col: str = "body",
) -> DataFrame:
    """Focused-crawl frontier prioritization (Chakrabarti et al. '99,
    anchor-text flavor): boost a frontier URL's priority by how many
    of the target-topic ``terms`` appear in the anchor texts of links
    POINTING AT it — before fetching a page, its backlink anchors are
    the best available relevance signal. The other feeder of the same
    ``priority`` claim key as :func:`pagerank_priority` (importance),
    this one topical.

    Returns ``(url, priority, n_term_hits, boost, boosted_priority)``
    where ``n_term_hits`` counts DISTINCT matched terms over ALL of
    the url's backlink anchors (word-boundary, case-insensitive),
    ``boost = boost_milli * n_term_hits div len(terms)`` (int64 — the
    same fixed-point determinism contract as PageRank above), and
    ``boosted_priority = priority + boost``. URLs with no matching
    backlinks keep their priority (hits 0, boost 0).

    Plan shape: link extraction is the zero-Python
    ``html.link_edges`` algebra; per-term hits fold into ONE
    target-keyed aggregate over narrow (target, 5xbool) rows; the
    tiny hit table joins back onto the frontier by url. Payload
    bodies never pass the explode."""
    if not terms:
        raise ValueError("terms must be non-empty")
    if boost_milli < 0:
        raise ValueError("boost_milli must be >= 0 (boost, not demotion)")
    import re as _re

    from .html import link_edges

    links = link_edges(pages, url_col=page_url_col, body_col=body_col)
    hit_cols = []
    for i, t in enumerate(terms):
        lead = r"\b" if _re.match(r"\w", t) else r"(?<!\w)"
        tail = r"\b" if _re.search(r"\w$", t) else r"(?!\w)"
        pat = "(?i)" + lead + _re.escape(t.lower()) + tail
        hit_cols.append(
            F.max(F.col("anchor").rlike(pat).cast("int")).alias(f"_h{i}")
        )
    hits = links.groupBy("target").agg(*hit_cols)
    n_hits = None
    for i in range(len(terms)):
        c = F.coalesce(F.col(f"_h{i}"), F.lit(0))
        n_hits = c if n_hits is None else n_hits + c
    # Collision-proof names + bound Column objects: the caller's
    # frontier may legitimately carry `n_term_hits`/`target` columns
    # (e.g. re-running the boost on an already-boosted frontier), and a
    # bare-name F.expr would then fail analysis as ambiguous.
    scored = hits.select(
        F.col("target").alias("_fb_target"),
        n_hits.cast("long").alias("_fb_hits"),
    )
    out = frontier.join(
        scored, frontier[url_col] == scored["_fb_target"], "left"
    )
    nh = F.coalesce(scored["_fb_hits"], F.lit(0)).cast("long")
    # Integer div on nonneg operands: floor == SQL div (n_term_hits and
    # boost_milli are >= 0; values are tiny so the double round-trip in
    # floor() is exact).
    boost = F.floor((F.lit(int(boost_milli)) * nh) / F.lit(len(terms))).cast("long")
    return out.select(
        frontier[url_col].alias("url"),
        F.col(priority_col).cast("long").alias("priority"),
        nh.alias("n_term_hits"),
        boost.alias("boost"),
        (F.col(priority_col).cast("long") + boost).alias("boosted_priority"),
    )


def hits_units(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    iters: int = 2,
    unit: int = DEFAULT_UNIT,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, hub_units, auth_units) after ``iters`` Kleinberg HITS
    iterations (Kleinberg, JACM'99) in int64 fixed-point.

    Complements :func:`pagerank_units` on the same discovered link
    graph: PageRank feeds the frontier's ``priority`` by global
    importance; HITS separates *hubs* (category/listing pages that
    point at many good pages — the reference's category spiders,
    spiders/*.py, crawl exactly these) from *authorities* (the product
    detail pages they point at). A focused product crawl claims high-
    hub pages first to maximize detail-page discovery per fetch.

    Determinism contract: all scores are int64 units; each half-step is
      auth'(v) = Σ_{u→v} hub(u)   then   auth = auth' div d_a
      hub'(u)  = Σ_{u→v} auth(v)  then   hub  = hub'  div d_h
    where ``d = max(1, max(score') div unit)`` — the integer stand-in
    for HITS' L2 normalization (only the *ordering* is consumed
    downstream, and floor-div by a scalar preserves int ordering).
    Integer sums are order-free, so results are bit-identical across
    partitionings/engines. Renormalizing every step bounds scores by
    ``unit * max_indegree`` — no overflow at any graph scale (raw
    power iteration overflows int64 in 2 rounds at 10^7-degree hubs).

    Scale shape (10^10 edges): two shuffles per iteration (edges ⋈
    scores on src resp. dst + the groupBy int64 sum with map-side
    partial agg — hot authorities combine locally before the
    exchange). The normalization divisor is a single 8-byte ``max``
    scalar per half-step — an O(1) driver value, not a driver data
    path. Score frames are ``localCheckpoint``-ed every iteration
    (same lineage discipline as dedup/text_corpus.py cluster loop:
    without the cut, Catalyst re-analyzes a plan that doubles per
    round)."""
    if iters < 0:
        raise ValueError("iters must be >= 0")
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    if nodes is None:
        nodes = e.select(F.col("src").alias("node")).union(
            e.select(F.col("dst").alias("node"))
        ).distinct()
    else:
        nodes = nodes.select(F.col(nodes.columns[0]).alias("node"))
    nodes = nodes.localCheckpoint()
    e = e.localCheckpoint()

    def _half_step(scores: DataFrame, join_on: str, out_of: str) -> DataFrame:
        # new(x) = Σ over edges of scores(other end); renormalize by the
        # integer divisor max(1, max div unit).
        flow = (
            e.join(scores.withColumnRenamed("node", join_on), join_on)
            .groupBy(F.col(out_of).alias("node"))
            .agg(F.sum("s").alias("_raw"))  # int64 sum: order-free, exact
        )
        raw = nodes.join(flow, "node", "left").select(
            "node", F.coalesce(F.col("_raw"), F.lit(0)).cast("long").alias("_raw")
        ).localCheckpoint()
        mx = raw.agg(F.max("_raw")).first()[0] or 0
        d = max(1, mx // unit)
        return raw.select("node", F.expr(f"_raw div {int(d)}").alias("s"))

    hub = nodes.select("node", F.lit(int(unit)).cast("long").alias("s"))
    auth = nodes.select("node", F.lit(int(unit)).cast("long").alias("s"))
    for _ in range(iters):
        auth = _half_step(hub, "src", "dst")   # authorities gather hub mass
        hub = _half_step(auth, "dst", "src")   # hubs gather authority mass
    return nodes.join(
        hub.select("node", F.col("s").alias("hub_units")), "node"
    ).join(auth.select("node", F.col("s").alias("auth_units")), "node")
