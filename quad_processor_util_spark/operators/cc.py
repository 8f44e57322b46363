"""Connected components by iterative joins with pointer-jumping,
for surface-form canonicalization over the alias graph.

The reference resolves redirects/sameAs with driver-side hash maps
(solr/SolrLoader.scala:41-84,176-197) — fine at 8 GB heap, impossible at
10^12 rows. Here: min-label propagation PLUS label shortcutting — each round
a node takes min(own label, neighbors' labels, label-of-its-label). The
label-of-label join halves every label-chain per round (pointer jumping /
path doubling, the same doubling that makes Kiveris et al.'s
large-star/small-star converge in O(log n)), so deep redirect chains —
common in alias graphs — resolve in O(log diameter) rounds, not
O(diameter). Each round is two equi-joins + one agg, all shuffling on the
node id. localCheckpoint truncates lineage so plans stay flat across
iterations.

If max_iter rounds pass without a fixpoint the function RAISES — silently
returning partially-propagated labels would hand wrong canonicals
downstream.

Canonical = lexicographic MIN IRI of each component (deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src_iri",
    dst: str = "dst_iri",
    max_iter: int = 20,
    driver_threshold: int = 100_000,
) -> DataFrame:
    """-> DataFrame(node STRING, canonical STRING): one row per node that
    appears in any edge; canonical is the component's min IRI (which may be
    the node itself).

    Graphs at or below `driver_threshold` edges take a driver-side
    union-find fast path (the reference's in-memory redirect maps,
    SolrLoader.scala:41-84 — correct engineering for a broadcast-sized
    dimension: each iterative-join round costs ~seconds of fixed job
    overhead that dwarfs a tiny graph). Larger graphs run the distributed
    pointer-jumping loop; pass driver_threshold=0 to force it.
    """
    spark = edges.sparkSession
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .where(F.col("a").isNotNull() & F.col("b").isNotNull())
        .distinct()
    )
    # size probe touches at most threshold+1 rows (a full e.count() would
    # scan + shuffle the entire edge set once just to pick a strategy);
    # the probe rows ARE the fast path's input — collecting limit(N+1)
    # once instead of count-then-collect halves the driver-path jobs
    # (round-5 review finding)
    if driver_threshold:
        probe = e.limit(driver_threshold + 1).collect()
        if len(probe) <= driver_threshold:
            from ..oracle import resolve_canonical

            pairs = [(r.a, r.b, "sameAs") for r in probe]
            mapping, _ = resolve_canonical(pairs)
            rows = sorted(mapping.items())
            return spark.createDataFrame(rows, "node string, canonical string")
    # undirected closure: both directions, so min propagates either way.
    # sym is loop-invariant and consumed by every pointer-jumping round:
    # without the checkpoint each round would re-scan + re-distinct
    # (shuffle) + re-union the full edge set from source (round-5 review
    # finding — the much smaller labels frame was already checkpointed).
    sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    sym = sym.localCheckpoint(eager=True)
    # labels: every node starts labeled with min(self, min neighbor)
    labels = (
        sym.groupBy("a")
        .agg(F.least(F.min("b"), F.first("a")).alias("label"))
        .select(F.col("a").alias("node"), "label")
    )
    labels = labels.localCheckpoint(eager=True)
    converged = False
    for _ in range(max_iter):
        # propagate: min over neighbors' labels ...
        neigh = (
            sym.join(labels.withColumnRenamed("node", "b"), "b")
            .groupBy("a")
            .agg(F.min("label").alias("nlabel"))
            .select(F.col("a").alias("node"), "nlabel")
        )
        # ... and shortcut: label of own label (pointer jumping — this is
        # what turns O(diameter) propagation into O(log diameter))
        hop = labels.select(
            F.col("node").alias("__lbl"), F.col("label").alias("llabel")
        )
        new_labels = (
            labels.join(neigh, "node", "left")
            .join(hop, labels["label"] == hop["__lbl"], "left")
            .select(
                "node",
                # least() skips NULL arguments (isolated node → nlabel
                # NULL; label's row absent → llabel NULL) and label itself
                # is never NULL, so no coalesce scaffolding is needed
                F.least(
                    F.col("label"), F.col("nlabel"), F.col("llabel")
                ).alias("label"),
            )
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components: no fixpoint after {max_iter} rounds — "
            f"labels would be wrong; raise max_iter (rounds needed ≈ "
            f"log2(graph diameter) with pointer jumping)"
        )
    return labels.select("node", F.col("label").alias("canonical"))


def canonical_mapping(
    alias_edges: DataFrame,
    src: str = "src_iri",
    dst: str = "dst_iri",
    kind: str = "edge_kind",
    max_iter: int = 20,
) -> tuple[DataFrame, DataFrame]:
    """Split alias edges into equivalences (redirect/sameAs -> CC) and
    disambiguation sources (-> excluded set, the anti-join side,
    SolrLoader.scala:124-127). Returns (mapping(node, canonical), excluded(iri))."""
    # NULL edge_kind counts as an equivalence (plain `!=` would silently
    # drop the edge: NULL != 'disambiguation' is NULL, not true)
    equiv = alias_edges.where(
        F.col(kind).isNull() | (F.col(kind) != "disambiguation")
    )
    excluded = (
        alias_edges.where(F.col(kind) == "disambiguation")
        .select(F.col(src).alias("iri"))
        .distinct()
    )
    mapping = connected_components(equiv, src, dst, max_iter)
    return mapping, excluded
