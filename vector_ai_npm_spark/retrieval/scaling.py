"""The ANN scale axis and recall floors, in ONE place (r13, verdict
item 4).

Rounds 8-12 fixed the same class of bug one query at a time: a fixed
search/capacity budget that was tuned on the 2k-row fixtures starved
recall at the next magnitude (fixed LSH tables at sf1, fixed nprobe at
sf1, fixed RQ stages at sf1, fixed beam/entries/rounds at sf10).  The
resolution was always the same shape — scale the BUDGET with the
corpus, hold the FLOOR constant — so both halves now live here:

The scale axis
    :func:`corpus_decades` — integer decades of corpus size beyond the
    2k-row tuning scale (0 at ≤2k, 1 at 20k, 2 at 200k, ...).  Every
    budget rule in the ANN family keys on this one function:

    ======================  =====================================  ==========
    budget helper           rule (base at decades=0)               evidence
    ======================  =====================================  ==========
    lsh.scaled_hash_tables  3 tables, +2/decade                    TUNING r11
    store.scaled_nprobe     4 cells, +1/decade (cap nlist)         TUNING r11
    wave56.scaled_rq_stages 4 bytes, +2/decade                     TUNING r12
    knn_graph.scaled_*      degree/rounds/beam/entries per decade  TUNING r12
    ======================  =====================================  ==========

The floors
    :data:`RECALL_FLOORS` / :func:`recall_floors` — per-query overlap
    and aggregate-recall floors for every hash-checked ANN contract.

    THE INVARIANT: floors are SCALE-INDEPENDENT.  They encode what the
    search family is supposed to deliver (e.g. half-probe IVF must
    beat 3/5 per query and 0.65 aggregate — the separation between
    pruned search and chance), and the budget rules above are
    responsible for delivering it at every magnitude.  When a floor
    goes red at a new scale, the fix is a budget rule that grows with
    ``corpus_decades`` (capacity, probes, tables, hops ... whichever
    axis the study shows is binding) — NEVER lowering the floor and
    NEVER a per-fixture special case.  That discipline is what kept
    sf0.01/0.1 hashes bit-identical across four rounds of scale fixes:
    every budget rule returns its base value at decades=0.
"""

from __future__ import annotations

import math

__all__ = ["TUNING_SCALE", "corpus_decades", "RECALL_FLOORS", "recall_floors"]

#: the corpus size the base budgets were tuned at (the sf0.01/sf0.1
#: embeddings fixtures are 500/2000 rows — both decades=0, so fixture
#: hashes never move when a budget rule is extended upward)
TUNING_SCALE = 2000


def corpus_decades(n: int, tuning_scale: int = TUNING_SCALE) -> int:
    """Integer decades of corpus size beyond the tuning scale.

    ``round`` (not floor): 20k is exactly one decade, 6k rounds to
    half-decade → 0 — budgets step at geometric midpoints, matching
    how every rule was measured (studies ran at 2k/20k/200k)."""
    return max(0, round(math.log10(max(n, 1) / float(tuning_scale))))


#: family → (per_query_overlap_floor, aggregate_recall_floor) for the
#: k=5, 3-query recall contracts.  Sourced by every contract face; see
#: module docstring for the scale-independence invariant.
RECALL_FLOORS: dict[str, tuple[int, float]] = {
    # exact-equivalent modes: pruning must not lose anything
    "ivf_full": (5, 1.0),          # all cells probed == exact
    "filtered_full": (5, 1.0),     # filtered, all cells probed
    # pruned/approximate modes: beat chance with clear margin
    "lsh": (4, 0.9),               # OR-amplified bucket join
    "ivf_half": (3, 0.65),         # nprobe = nlist/2 — the family bar
    "filtered_widened": (3, 0.75), # selectivity-widened half probe
    "ivfrq_half": (3, 0.65),       # RQ codes under half probe
    "ivfrq_full": (4, 0.8),        # RQ codes, all cells (ADC loss only)
    "knn_graph": (3, 0.65),        # beam search at ≤ the ivf_half budget
}


def recall_floors(family: str) -> tuple[int, float]:
    """(per_q_floor, agg_floor) for a contract family; KeyError on an
    unknown family is deliberate — a new contract must REGISTER its
    floor here, where the invariant is documented, not inline."""
    return RECALL_FLOORS[family]
