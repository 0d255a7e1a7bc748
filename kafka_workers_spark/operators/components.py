"""Connected components over candidate-pair edges: dedup group resolution.

Near-dup pair generation (operators/dedup.py: LSH bands, simhash bands,
min-shingle blocks) yields an EDGE LIST of similar document pairs. Turning
pairs into dedup decisions needs the transitive closure: documents A-B and
B-C similar means {A, B, C} is one group with one canonical survivor.
``pipeline.near_dedup_lsh`` uses the greedy one-join shortcut (drop any doc
colliding with a lower id — over-deletes chains); this module is the exact
resolution: min-label connected components, the standard production pass.

The reference has no content operators at all (payloads are opaque bytes,
api/task/WorkerTask.java:50); this is part of the engine's training-data
surface.

Algorithm: iterative min-label propagation — each round every node takes
the minimum component label among itself and its neighbors, until a fixed
point. Rounds = O(component diameter); near-dup graphs are dense clusters
with tiny diameters (2-4 hops), so this converges in a handful of rounds
even at 10⁹ nodes. Each round is one shuffle (edge⋈label join + min
aggregate) — the same cost envelope as large-star/small-star (Kiveris et
al., "Connected Components in MapReduce and Beyond", SoCC'14) without its
edge-rewriting constant factor, the right trade for small-diameter graphs.
A diameter-shaped chain graph still converges, just in more rounds (capped
by ``max_rounds``).

Scale notes:
- Labels are (node, comp) pairs — never payloads — so the per-round
  shuffle is two longs per edge.
- Each round ends in ``localCheckpoint(eager=True)``. This is mandatory
  for the iteration, not an optimization: the round's plan references the
  previous labels twice (propagation join + convergence compare), so the
  logical plan DOUBLES per round and Catalyst analysis alone OOMs the
  driver after ~20 rounds. Checkpointing truncates lineage to the
  materialized result. The block-manager caveat that rules
  localCheckpoint out for payload stages (operators/dedup.barrier) is
  acceptable here: the checkpointed state is two longs per node, and on a
  cluster job a configured ``sparkContext.setCheckpointDir`` +
  ``checkpoint()`` swap makes the rounds executor-loss-safe.
- Convergence is detected with an existence check of changed labels (one
  cheap action per round over (node, comp) pairs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_rounds: int = 50,
) -> DataFrame:
    """Resolve an undirected edge list into ``(node, comp)`` where ``comp``
    is the minimum node id in the node's connected component.

    EAGER: the rounds execute at call time (iterative convergence cannot
    be expressed as one lazy plan); the returned frame reads the final
    checkpointed labels. When ``sparkContext.setCheckpointDir`` is
    configured the rounds use reliable ``checkpoint()`` — survives
    executor loss, the right mode for cluster jobs; otherwise
    ``localCheckpoint`` (block-manager, fine for local/test runs).

    Raises ``RuntimeError`` if ``max_rounds`` passes without convergence
    (component diameter > max_rounds — e.g. a 50+-hop chain of sliding
    near-duplicates) instead of silently returning labels that would leave
    several survivors in one group.

    Only nodes appearing in ``pairs`` are returned (isolated documents are
    their own component by definition — left-join the corpus afterwards
    with ``coalesce(comp, id)``).
    """
    # sparkContext is classic-only; under Spark Connect there is no
    # checkpoint-dir query and no RDD bookkeeping — fall back to
    # localCheckpoint-only rounds with no eager unpersist (the GC path)
    sc = getattr(pairs.sparkSession, "sparkContext", None)
    reliable = sc is not None and sc.getCheckpointDir() is not None

    def _pin(df: DataFrame) -> DataFrame:
        # lineage truncation each round — see module docstring; without it
        # the logical plan doubles per round
        return df.checkpoint(eager=True) if reliable else df.localCheckpoint(eager=True)

    def _persistent_ids() -> set[int]:
        try:
            return {int(k) for k in sc._jsc.getPersistentRDDs().keySet().toArray()}  # noqa: SLF001
        except Exception:  # noqa: BLE001 — best-effort bookkeeping only
            return set()

    def _free(rdd_ids: set[int]) -> None:
        # superseded local checkpoints otherwise stay pinned in executor
        # block managers until GC notices the dropped python reference;
        # at 10⁹ nodes each round is ~16 bytes × n, so free them promptly
        try:
            jmap = sc._jsc.getPersistentRDDs()  # noqa: SLF001
            for rid in rdd_ids:
                jrdd = jmap.get(rid)
                if jrdd is not None:
                    jrdd.unpersist(False)
        except Exception:  # noqa: BLE001
            pass

    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(pairs.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    before = _persistent_ids()
    labels = _pin(
        edges.select(F.col("u").alias("node")).distinct().withColumn("comp", F.col("node"))
    )
    label_ids = _persistent_ids() - before
    try:
        for _ in range(max_rounds):
            nbr_min = (
                edges.join(labels, edges["v"] == labels["node"])
                .groupBy("u")
                .agg(F.min("comp").alias("nbr_comp"))
            )
            before = _persistent_ids()
            new_labels = _pin(
                labels.join(nbr_min, labels["node"] == nbr_min["u"], "left").select(
                    "node",
                    F.least(F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))).alias(
                        "comp"
                    ),
                )
            )
            new_ids = _persistent_ids() - before
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "node")
                .filter(F.col("n.comp") != F.col("o.comp"))
                .limit(1)
                .count()
            )
            _free(label_ids)  # the superseded round; changed-check is done with it
            label_ids = new_ids
            labels = new_labels
            if changed == 0:
                return labels.select("node", "comp")
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds "
            "(component diameter exceeds max_rounds); raise max_rounds"
        )
    finally:
        edges.unpersist()


def dedup_groups(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """Attach ``group_id`` (component minimum — the canonical survivor's
    id) and ``is_canonical`` to every document. Documents in no pair are
    their own singleton group. The exact-resolution alternative to
    ``pipeline.near_dedup_lsh``'s greedy rule: a doc bridging two clusters
    merges them instead of deleting both tails."""
    comp = connected_components(pairs, src=src, dst=dst)
    return (
        docs.join(comp, docs[id_col] == comp["node"], "left")
        .select(
            docs["*"],
            F.coalesce(F.col("comp"), docs[id_col]).alias("group_id"),
        )
        .withColumn("is_canonical", F.col("group_id") == F.col(id_col))
    )
