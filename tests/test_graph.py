"""PageRank tests: mass conservation, authority ordering, determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from dotnetvectorsearch_spark.operators.graph import pagerank_undirected


@pytest.fixture(scope="module")
def star_pairs(spark):
    # star: hub 0 connected to 1..4, plus an isolated pair (10, 11)
    rows = [Row(id_a=0, id_b=i) for i in range(1, 5)]
    rows.append(Row(id_a=10, id_b=11))
    return spark.createDataFrame(rows)


def test_pagerank_mass_conserved_and_hub_ranks_highest(star_pairs):
    ranks = {r.node: r.pagerank
             for r in pagerank_undirected(star_pairs, iters=5).collect()}
    assert len(ranks) == 7
    # no dangling nodes -> total rank mass stays 1 every iteration
    assert abs(sum(ranks.values()) - 1.0) < 1e-4
    hub, leaf = ranks[0], ranks[1]
    assert hub > leaf                      # authority concentrates
    assert ranks[1] == ranks[2] == ranks[3] == ranks[4]  # symmetry
    assert ranks[10] == ranks[11]


def test_pagerank_deterministic_across_partitionings(spark, star_pairs):
    a = {r.node: r.pagerank
         for r in pagerank_undirected(star_pairs).collect()}
    b = {r.node: r.pagerank
         for r in pagerank_undirected(
             star_pairs.repartition(7)).collect()}
    assert a == b   # decimal-summed contributions: bit-equal either way
