"""Near-duplicate cluster resolution — connected components over candidate
pairs, and canonical-document selection.

The dedup family (exact / MinHash-LSH / SimHash / embedding buckets,
``dedup.py``) emits PAIRS. Collapsing a 10^12-document corpus needs the
transitive closure of those pairs: if A~B and B~C, exactly one of {A,B,C}
survives. This module supplies that last stage:

* :func:`connected_components` — min-label propagation with pointer
  jumping (path compression), the O(log n)-round PRAM classic expressed as
  DataFrame joins. Each round is (a) neighbor-min: every node takes the
  smallest component label among itself and its neighbors, then (b) pointer
  jump: ``comp(u) ← comp(comp(u))``, which collapses label chains
  geometrically — a million-node path component converges in ~20 rounds,
  not a million. Convergence is detected by the (monotonically decreasing)
  sum of labels, one cheap aggregate per round.
* :func:`canonical_docs` — one survivor per component (min id — stable,
  deterministic, join-free tie-break).

Scale shape: every round is two hash joins + one groupBy on ``id`` —
bounded-key equi-joins, no driver-side data. Lineage is cut each round:
reliable checkpoints when the session has a checkpoint dir (cluster —
persist-then-eager-checkpoint so nothing recomputes), ``localCheckpoint``
otherwise (local mode). Label payload is one
long per node: 16 B/doc in shuffle, ~16 TB/round at 10^12 docs — the same
order as one LSH banding pass, and rounds are logarithmic.

Reference scope note: parquet-java has no clustering stage (it is an
encoding layer); this operator belongs to the training-data-pipeline
surface the mission brief adds on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _cut_lineage(df: DataFrame) -> DataFrame:
    """Truncate lineage at an iteration boundary. Reliable checkpoint when
    the session has a checkpoint dir (cluster: survives executor loss;
    persist first so the checkpoint write reads cache blocks instead of
    recomputing the round — the minhash r5 fix), localCheckpoint otherwise
    (local mode: executor == driver anyway)."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        from pyspark import StorageLevel

        df = df.persist(StorageLevel.MEMORY_AND_DISK)
        ck = df.checkpoint(eager=True)
        df.unpersist(blocking=False)
        return ck
    return df.localCheckpoint()


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    nodes: DataFrame | None = None,
    max_iter: int = 30,
) -> DataFrame:
    """Resolve the undirected graph given by ``edges`` into components.

    Returns ``(id, comp)`` where ``comp`` is the smallest node id in the
    component. ``nodes`` (a one-column frame of ids) adds isolated nodes —
    without it only endpoints of edges appear.

    ``max_iter`` is a safety rail; pointer jumping needs ~log2(longest
    label chain) rounds (a 2^30-node path fits in 30).
    """
    e = (
        edges.select(F.col(src).cast("long").alias("s"), F.col(dst).cast("long").alias("d"))
        .filter(F.col("s") != F.col("d"))
    )
    e = e.union(e.select(F.col("d").alias("s"), F.col("s").alias("d"))).distinct()
    e = _cut_lineage(e)  # edges are reused every round

    lab = e.groupBy(F.col("s").alias("id")).agg(F.min("d").alias("comp"))
    lab = lab.withColumn("comp", F.least("id", "comp"))
    if nodes is not None:
        ids = nodes.select(F.col(nodes.columns[0]).cast("long").alias("id")).distinct()
        lab = (
            ids.join(lab, "id", "left")
            .select("id", F.coalesce("comp", "id").alias("comp"))
        )
    lab = _cut_lineage(lab)
    prev = lab.agg(F.sum("comp")).first()[0]

    for _ in range(max_iter):
        # neighbor-min: comp'(u) = min(comp(u), min_{v∈Γ(u)} comp(v))
        msgs = e.join(lab, e["s"] == lab["id"]).select(
            F.col("d").alias("id"), F.col("comp")
        )
        lab = (
            lab.select("id", "comp")
            .union(msgs)
            .groupBy("id")
            .agg(F.min("comp").alias("comp"))
        )
        # pointer jump: comp''(u) = comp(comp'(u)) — halves label-chain depth
        l2 = lab.select(F.col("id").alias("jid"), F.col("comp").alias("jcomp"))
        lab = (
            lab.join(l2, lab["comp"] == l2["jid"], "left")
            .select("id", F.coalesce("jcomp", "comp").alias("comp"))
        )
        lab = _cut_lineage(lab)  # every round: lineage growth is exponential in rounds
        cur = lab.agg(F.sum("comp")).first()[0]
        if cur == prev:
            break
        prev = cur
    return lab


def canonical_docs(
    components: DataFrame,
    quality: DataFrame | None = None,
    id_col: str = "id",
    score_col: str | None = None,
) -> DataFrame:
    """One survivor per component: ``(comp, keep_id, n_members)``.

    Default keep rule is min id (stable, join-free). Pass ``quality``
    (a frame with ``id_col`` + ``score_col``) to keep the highest-scoring
    member instead — the realistic web-corpus rule (keep the longest /
    best-quality near-duplicate); ties break to the smallest id. One
    equi-join on id + one max_by agg — same shuffle shape either way."""
    if quality is None:
        return components.groupBy("comp").agg(
            F.min("id").alias("keep_id"), F.count(F.lit(1)).alias("n_members")
        )
    q = quality.select(
        F.col(id_col).cast("long").alias("id"), F.col(score_col).alias("__q")
    )
    return (
        components.join(q, "id")
        .groupBy("comp")
        .agg(
            F.max_by("id", F.struct(F.col("__q"), (-F.col("id")).alias("__nid"))).alias("keep_id"),
            F.count(F.lit(1)).alias("n_members"),
        )
    )
