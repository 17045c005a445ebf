"""Connected components over near-duplicate pairs (B18 closing step).

A candidate-pair list is not yet a deduplication: clusters form by
TRANSITIVITY (A~B, B~C ⇒ {A,B,C} share one canonical doc even if A,C
never paired). This module turns any pair relation into a per-doc
component id — the step that makes minhash/simhash/embedding pairs an
actionable "keep one per cluster" decision.

Reference context: the reference dedups only by exact content match at
query time (vector-client.ts:436-444 groups retrieved chunks by their
shared parent context string); corpus-level near-dup clustering has no
reference equivalent — it is north-star scope.

Algorithm: iterative min-label propagation WITH POINTER JUMPING.
Every vertex starts labeled with itself; each round every vertex takes
the min of its own and its neighbors' labels, then jumps its label to
its label's label (labels are always vertex ids, so the label relation
is itself a forest to hop through). Neighbor-min alone needs
diameter rounds (a 1000-link chain = 1000 shuffles); the jump doubles
the propagation distance per round, giving O(log n) convergence on any
shape — the same guarantee the small-star/large-star formulation gets,
with simpler joins. Verified on chains/stars/random graphs against a
union-find reference (tests/test_components_properties.py).

Scale notes: each round is two key-joins + one aggregate (all shuffles
on vertex/label ids — never a cartesian). For near-dup clusters
(near-cliques, diameter ≲ 3) it converges in 2-3 rounds either way.
Lineage is cut every round with localCheckpoint — without it the plan
doubles per iteration and planning time explodes by round ~8.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SUM_UNSET = object()  # convergence-sum sentinel (see the round loop)


def connected_components(
    pairs: DataFrame,
    src: str = "doc_id_a",
    dst: str = "doc_id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(src, dst) pairs → (doc_id, component_id) for every vertex that
    appears in any pair; component_id = min doc_id of the component."""
    edges = (
        pairs.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .union(pairs.select(F.col(dst).alias("s"), F.col(src).alias("d")))
        .distinct()
        .localCheckpoint()
    )
    labels = edges.select(F.col("s").alias("v")).distinct().select(
        "v", F.col("v").alias("label")
    )
    prev_sum: object = _SUM_UNSET
    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels, edges.d == labels.v)
            .groupBy("s")
            .agg(F.min("label").alias("nbr_label"))
        )
        stepped = labels.join(nbr_min, labels.v == nbr_min.s, "left").select(
            "v",
            F.least(
                F.col("label"), F.coalesce("nbr_label", F.col("label"))
            ).alias("label"),
        )
        # pointer jump: label[v] := label[label[v]] — labels are vertex
        # ids, so self-joining the label relation doubles propagation
        # distance per round (O(log n) rounds on chains vs O(n) without)
        lv = stepped.select(
            F.col("v").alias("jv"), F.col("label").alias("jlabel")
        )
        new_labels = (
            stepped.join(lv, stepped.label == lv.jv, "left")
            .select(
                "v",
                F.least(
                    F.col("label"), F.coalesce("jlabel", F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=False)  # lazy: the convergence
            # aggregate below is the materializing action, so lineage
            # is cut at ONE job per round instead of checkpoint + check
        )
        # Convergence witness (r14): labels only ever DECREASE (every
        # update is a least() against the previous value over a fixed
        # vertex set), so an unchanged exact label SUM proves no vertex
        # changed — replacing the old per-round new⋈old join+count with
        # one aggregate that doubles as the checkpoint materializer.
        # decimal(38,0) keeps the sum exact at any vertex-id magnitude.
        lsum = new_labels.agg(
            F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]
        labels = new_labels
        # sentinel start: the first round can never false-break, and an
        # EMPTY vertex set (sum NULL every round) still terminates on
        # the second round's NULL == NULL
        if lsum == prev_sum:
            break
        prev_sum = lsum
    return labels.select(F.col("v").alias("doc_id"), F.col("label").alias("component_id"))


def assign_components(
    docs: DataFrame, pairs: DataFrame, doc_id: str = "doc_id"
) -> DataFrame:
    """Every doc gets a component id (its own id when unpaired) plus the
    is_canonical flag a keep-one-per-cluster filter consumes."""
    comp = connected_components(pairs)
    return (
        docs.select(doc_id)
        .join(comp, on=doc_id, how="left")
        .select(
            doc_id,
            F.coalesce("component_id", F.col(doc_id)).alias("component_id"),
        )
        .withColumn("is_canonical", F.col(doc_id) == F.col("component_id"))
    )
