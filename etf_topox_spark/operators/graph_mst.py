"""Distributed minimum spanning tree — Borůvka rounds over the shared CC
machinery (SURVEY.md §2.C graph-analytics family, next to
graph_connected_components / graph_weighted_sssp).

Borůvka is THE distributed MST algorithm (each round every component
selects its cheapest outgoing edge, selected edges merge components —
components at least halve, so rounds are O(log n)): per round ONE
partial-aggregable min(struct) exchange on the component key plus a
component-graph contraction via operators.topology.connected_components
(driver union-find below the measured crossover, large-star/small-star
above — the 100 TB path). Edge weights are constructed DISTINCT
(w = hash(eid) * 4096 + eid), so the MST is unique and Borůvka (engine)
and Prim (oracle — a recursive CTE growing the visited set as a LIST,
argmin crossing edge per step via a correlated subquery) must select the
IDENTICAL edge set, not just the same total weight. The graph is a
deterministic backbone path (connectivity guarantee) plus modular extra
edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etf_topox_spark.registry import query

N_MST = 200        # nodes
M_EXTRA = 1_800    # extra (non-backbone) edge slots
MAX_ROUNDS = 12    # > log2(N_MST) — the loop breaks as soon as one component remains

_W = "((eid * 48271) % 99991) * 4096 + eid"  # distinct by the eid tail

_EDGES_SQL = f"""
  SELECT eid, eid AS u, eid + 1 AS v, {_W} AS w
  FROM (SELECT CAST(range AS BIGINT) AS eid FROM range({N_MST - 1}))
  UNION ALL
  SELECT eid, (e * 641) % {N_MST} AS u, (e * 331 + 7) % {N_MST} AS v, {_W} AS w
  FROM (
    SELECT CAST(range AS BIGINT) + {N_MST - 1} AS eid,
           CAST(range AS BIGINT) AS e
    FROM range({M_EXTRA})
  )
  WHERE (e * 641) % {N_MST} <> (e * 331 + 7) % {N_MST}
"""

_MST_SQL = f"""
WITH RECURSIVE edges AS ({_EDGES_SQL}),
grow AS (
  SELECT 0 AS k, [CAST(0 AS BIGINT)] AS visited,
         CAST(NULL AS BIGINT) AS eid, CAST(NULL AS BIGINT) AS u,
         CAST(NULL AS BIGINT) AS v, CAST(NULL AS BIGINT) AS w
  UNION ALL
  SELECT k + 1,
         list_append(visited, CASE WHEN list_contains(visited, pick.u)
                                   THEN pick.v ELSE pick.u END),
         pick.eid, pick.u, pick.v, pick.w
  FROM (
    SELECT k, visited,
           (SELECT {{'eid': e.eid, 'u': e.u, 'v': e.v, 'w': e.w}}
            FROM edges e
            WHERE list_contains(g.visited, e.u) <> list_contains(g.visited, e.v)
            ORDER BY e.w LIMIT 1) AS pick
    FROM grow g WHERE k < {N_MST - 1}
  )
)
SELECT eid, u, v, w FROM grow WHERE eid IS NOT NULL ORDER BY eid
"""


def _edges(spark: SparkSession) -> DataFrame:
    back = spark.range(0, N_MST - 1).select(
        F.col("id").alias("eid"),
        F.col("id").alias("u"),
        (F.col("id") + 1).alias("v"),
    )
    extra = (
        spark.range(0, M_EXTRA)
        .select(
            (F.col("id") + N_MST - 1).alias("eid"),
            F.expr(f"(id * 641) % {N_MST}").alias("u"),
            F.expr(f"(id * 331 + 7) % {N_MST}").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
    )
    return back.unionByName(extra).withColumn("w", F.expr(_W))


@query("graph_mst_boruvka", oracle=_MST_SQL)
def graph_mst_boruvka(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The unique MST's edge list (eid, u, v, w) via Borůvka rounds
    (module docstring). The per-round isEmpty gate is a bounded driver
    scalar (≤ MAX_ROUNDS actions), the same pattern as the BFS/SSSP
    convergence checks."""
    from etf_topox_spark.operators.topology import connected_components

    edges = _edges(spark).localCheckpoint(eager=False)
    comp = edges.select(F.col("u").alias("node")).unionByName(
        edges.select(F.col("v").alias("node"))
    ).distinct().withColumn("comp", F.col("node"))

    chosen = []
    for _ in range(MAX_ROUNDS):
        cu = comp.select(F.col("node").alias("u"), F.col("comp").alias("cu"))
        cv = comp.select(F.col("node").alias("v"), F.col("comp").alias("cv"))
        cross = (
            edges.join(cu, "u").join(cv, "v").filter(F.col("cu") != F.col("cv"))
        ).localCheckpoint(eager=True)
        if cross.isEmpty():
            break
        cand = F.struct("w", "eid", "u", "v", "cu", "cv").alias("cand")
        sel = (
            cross.select(F.col("cu").alias("comp"), cand)
            .unionByName(cross.select(F.col("cv").alias("comp"), cand))
            .groupBy("comp")
            .agg(F.min("cand").alias("m"))
            .select("m.*")
            .distinct()
            .localCheckpoint(eager=True)
        )
        chosen.append(sel.select("eid", "u", "v", "w"))
        merge = sel.select(F.col("cu").alias("src"), F.col("cv").alias("dst"))
        relabel = connected_components(merge)
        comp = (
            comp.join(relabel, comp["comp"] == relabel["node"], "left")
            .select(
                comp["node"],
                F.coalesce(relabel["root"], comp["comp"]).alias("comp"),
            )
            .localCheckpoint(eager=True)
        )

    out = chosen[0]
    for c in chosen[1:]:
        out = out.unionByName(c)
    return out.distinct().orderBy("eid")
