"""Graph analytics as relational computations: integer-space PageRank.

Like k-means (clustering.py) and BPE (bpe.py), the iterative algorithm
is driver-side over FLAT lineage — every iteration is one join + one
aggregation, with the per-node state frame eagerly truncated so n_iter
rounds never stack a deep plan. And like those operators, all arithmetic
is EXACT integer so the result is hash-oracle-able across engines:

- ranks live in micro-units of total mass 1 (``rank_us`` BIGINT,
  initially ``1_000_000 div N``);
- an edge's contribution is ``(rank_us * d_pct) div (100 * outdeg)``
  — integer division, identical in Spark (``div``) and DuckDB (``//``);
- each round: ``rank' = (100-d_pct)*1e6 div (100*N) + Σ contributions``.

Floor-truncation loses a few micro-units per edge and dangling nodes'
mass is dropped rather than redistributed — the standard simplification
(mass is not conserved exactly; RANKING is what the operator delivers).
Both deviations are deterministic and mirrored by the oracle.

100 TB posture: per iteration one shuffle co-partitioned on ``src``
(edges ⋈ outdeg ⋈ ranks) and one on ``dst`` (the contribution sum) —
the exact data layout Pregel/GraphX uses, expressed as joins Catalyst
can plan (AQE handles skewed hub nodes). State is one BIGINT per node;
iterations are lineage-free via eager localCheckpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank_int(
    edges: DataFrame, n_iter: int = 2, damping_pct: int = 85
) -> DataFrame:
    """PageRank over distinct ``(src, dst)`` edges; returns
    ``(node, rank_us)``. ``damping_pct`` is the damping factor in
    percent (85 = the canonical 0.85) so the hot loop stays in integer
    arithmetic."""
    if not 0 <= damping_pct <= 100:
        raise ValueError("damping_pct must be in [0, 100]")
    edges = edges.select("src", "dst").distinct()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()  # driver scalar — an index artifact, like k·d centroids
    if n == 0:
        return nodes.withColumn("rank_us", F.lit(None).cast("long"))
    base = (100 - damping_pct) * 1_000_000 // (100 * n)
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("__outdeg"))
    ranks = nodes.withColumn("rank_us", F.lit(1_000_000 // n).cast("long"))
    for _ in range(n_iter):
        contrib = (
            edges.join(outdeg, "src")
            .join(ranks.withColumnRenamed("node", "src"), "src")
            .select(
                F.col("dst").alias("node"),
                F.expr(f"(rank_us * {damping_pct}) div (100 * __outdeg)").alias("__c"),
            )
        )
        sums = contrib.groupBy("node").agg(F.sum("__c").alias("__s"))
        ranks = (
            nodes.join(sums, "node", "left")
            .select(
                "node",
                (F.lit(base) + F.coalesce(F.col("__s"), F.lit(0)))
                .cast("long")
                .alias("rank_us"),
            )
            .localCheckpoint(eager=True)  # flat lineage per round
        )
    return ranks
