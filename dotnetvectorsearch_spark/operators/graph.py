"""Graph analytics over document/similarity graphs.

Connected components (the dedup-clustering workhorse) lives in
``operators/dedup.py``; this module holds ranking-style iterative
algorithms. First resident: fixed-iteration PageRank over an undirected
similarity graph — the curation signal web-scale pipelines propagate
over dup/link graphs to pick WHICH copy of near-duplicate content to
keep (keep the authoritative node, drop the mirrors).

Scale shape: pure DataFrame joins/aggregations — the standard
"SQL PageRank". Per iteration: one equi-join of the edge list against
the rank table (edges pre-partitioned by source once, persisted, so
every iteration reuses the same exchange side) and one groupBy(dst) with
map-side partial aggregation. Driver holds nothing; rank sums go
through DECIMAL so results are partition-order independent (the same
order-independence discipline as ``ann.centroids_by``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dotnetvectorsearch_spark.caching import transient_persist

_DEC = "decimal(27,15)"


def pagerank_undirected(pairs: DataFrame, src: str = "id_a",
                        dst: str = "id_b", iters: int = 5,
                        damping: float = 0.85,
                        round_digits: int = 6) -> DataFrame:
    """Fixed-iteration PageRank on an undirected pair list.

    ``pairs`` is one row per undirected edge (id_a, id_b); both
    directions are materialized internally. Every endpoint has degree
    >= 1, so there are no dangling nodes and the per-iteration update is
    exactly ``r_v = (1-d)/N + d * sum_{u in nbr(v)} r_u / deg_u`` with
    N = number of distinct endpoints. Returns (node, pagerank) with
    pagerank rounded to ``round_digits``.

    Determinism: each contribution ``r_u / deg_u`` is an IEEE double
    computed identically on any engine; the per-node SUM is cast to
    decimal so reduce order can't flip low bits — an oracle running the
    same unrolled recurrence gets bit-equal rounded output.

    Fixed ``iters`` (not convergence-tested) keeps the plan finite and
    the oracle expressible; 5 iterations is plenty for ranking stability
    on similarity graphs, and a caller can raise it. Lineage grows one
    join per iteration — past ~20 iterations add a localCheckpoint like
    ``dedup.connected_components`` does.
    """
    # Both directions via one explode, NOT a self-union: a union
    # evaluates the (expensive) pairs plan once per branch, so the
    # old nodes-then-edges persist order ran the upstream similarity
    # join up to 4x (2 for nodes.count through the unpersisted union,
    # 2 again when the edges persist materialized). One explode per
    # pair row + persisting edges FIRST and deriving nodes from the
    # persisted frame evaluates pairs exactly once.
    edges = (pairs.select(F.explode(F.array(
        F.struct(F.col(src).alias("src"), F.col(dst).alias("dst")),
        F.struct(F.col(dst).alias("src"), F.col(src).alias("dst")),
    )).alias("e")).select("e.src", "e.dst"))
    edges = transient_persist(edges.repartition("src"))
    nodes = transient_persist(
        edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg")))
    n = nodes.count()
    base = (1.0 - damping) / n
    ranks = nodes.select("src", "deg",
                         F.lit(1.0 / n).alias("rank"))
    for _ in range(iters):
        contrib = (edges.join(ranks, "src")
                   .select(F.col("dst").alias("src"),
                           (F.col("rank") / F.col("deg")).alias("c")))
        summed = (contrib.groupBy("src")
                  .agg(F.sum(F.col("c").cast(_DEC)).cast("double")
                       .alias("s")))
        ranks = (nodes.join(summed, "src")
                 .select("src", "deg",
                         (F.lit(base) + F.lit(damping) * F.col("s"))
                         .alias("rank")))
    return ranks.select(F.col("src").alias("node"),
                        F.round("rank", round_digits).alias("pagerank"))
