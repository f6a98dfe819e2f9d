"""Connected components over near-duplicate pair graphs — turns the
pairwise output of the dedup operators (MinHash / SimHash / n-gram
Jaccard) into transitive DEDUP GROUPS, the form a training-data
pipeline actually consumes ("keep one doc per group").

Iterative min-label propagation on DataFrames:

    label(v) <- min(label(v), min over neighbors u of label(u))

repeated to fixpoint.  Each iteration is one join + one aggregation
(both partitioned on the node key — Catalyst reuses the hash
partitioning between them), and ``localCheckpoint`` truncates the
lineage so the plan doesn't grow with iterations — the standard way
to keep iterative algorithms stable on Spark.  Convergence needs at
most the component diameter iterations; near-dup clusters are
shallow (duplicates of duplicates), so this terminates in a handful
of rounds even at corpus scale, and every round is a full-cluster
parallel step, not a driver loop over rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """(id, group_id) where ``group_id`` is the minimum node id in the
    node's connected component; isolated nodes form singleton groups.

    Raises if ``max_iter`` rounds don't reach the fixpoint (pathological
    path-shaped graphs — raise the cap or pre-contract).
    """
    # symmetrize with a per-row explode, NOT a self-union: a union
    # would execute the (potentially expensive — e.g. the whole
    # MinHash verify pipeline) edge lineage once PER BRANCH, doubling
    # the dominant cost; the explode emits both directions in a single
    # pass over a single execution
    sym = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col(src_col).alias("src"),
                        F.col(dst_col).alias("dst"),
                    ),
                    F.struct(
                        F.col(dst_col).alias("src"),
                        F.col(src_col).alias("dst"),
                    ),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
    )
    # NO distinct here: the min-label aggregation is duplicate-
    # tolerant, so deduping the edge list would spend a full shuffle
    # of the largest table in the loop purely on cosmetics.  Callers
    # with heavily duplicated edge lists should dedup upstream.
    # materialize the edge set ONCE — its lineage may be an expensive
    # pipeline (e.g. the whole MinHash candidate join) that would
    # otherwise re-execute on every iteration's action
    sym = sym.localCheckpoint(eager=True)
    # iterate ONLY over edge endpoints: isolated nodes can never change
    # label, so keeping them out of the loop makes each round
    # proportional to the (small) near-dup subgraph, not the corpus.
    # The identity initialization (label = node) makes round 1 of the
    # generic loop compute exactly min(node, min(neighbors)) — so fuse
    # that round into the init as ONE aggregation over the edge list,
    # saving a full join+agg+join+checkpoint cycle per call
    # LAZY checkpoint (r11): the convergence count below is the first
    # action over each round's table, so it doubles as the
    # materializer — one Spark job per round instead of two (the
    # eager-checkpoint job + a separate count job), and the init
    # aggregation rides inside round 1's job instead of its own.
    # Lineage is still truncated at every checkpoint node, so plan
    # depth stays flat; `sym` above stays EAGER because it appears at
    # two leaves of round 1's plan (directly and inside the init
    # aggregation) and its lineage is the expensive pair pipeline —
    # un-materialized it would execute twice in that job.
    labels = (
        sym.groupBy("src")
        .agg(F.least(F.col("src"), F.min("dst")).alias("label"))
        .select(F.col("src").alias("node"), "label")
        .localCheckpoint(eager=False)
    )
    converged = False
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym["src"] == labels["node"])
            .groupBy("dst")
            .agg(F.min("label").alias("nb_label"))
        )
        # the convergence flag is computed INSIDE the update join (old
        # and new label are both on the row) and rides through the
        # checkpoint — the fixpoint test is then a filter-count over
        # the materialized table, not another labels-vs-labels join
        # job per round
        stepped = (
            labels.join(neighbor_min, labels["node"] == neighbor_min["dst"], "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("nb_label", "label")
                ).alias("label"),
                (
                    F.coalesce("nb_label", "label") < F.col("label")
                ).alias("_changed"),
            )
        )
        stepped = stepped.localCheckpoint(eager=False)
        changed = stepped.filter(F.col("_changed")).count()
        labels = stepped.drop("_changed")
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components: no fixpoint in {max_iter} iters"
        )
    node_ids = nodes.select(F.col(id_col))
    return (
        node_ids.join(labels, node_ids[id_col] == labels["node"], "left")
        .select(
            F.col(id_col),
            F.coalesce("label", F.col(id_col)).alias("group_id"),
        )
    )


def near_dup_groups(
    documents: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Transitive dedup groups for a whole corpus: every document
    labeled with its component's minimum doc_id (the canonical
    representative to keep), singletons included."""
    nodes = documents.select(id_col)
    return connected_components(nodes, pairs, id_col=id_col)


def select_canonical(
    documents: DataFrame,
    pairs: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """The keep/drop DECISION a dedup pipeline ends with: group the
    corpus transitively (``near_dup_groups``) and elect one canonical
    document per group — the one with the highest ``score_col``
    (ties -> lowest id; "keep the longest/highest-quality copy", the
    standard curation policy, rather than ``near_dup_groups``'s
    positional min-id representative).

    Returns every document as (id, group_id, canonical_id, keep) so
    the caller can either filter ``keep`` or audit what was dropped
    and why (``canonical_id`` points at the surviving copy).

    Cost on top of the component labels: one broadcast-size join of
    (id, score) onto the labels and one partial->final ``max_by`` per
    group — the score ride-along never shuffles document text.
    """
    groups = near_dup_groups(documents, pairs, id_col=id_col)
    scored = groups.join(
        documents.select(id_col, score_col), id_col
    )
    # arg-max via max(struct(score, -id)): struct comparison is
    # field-ordered, so the winner is highest score, then lowest id —
    # one partial->final agg, no rank window
    winners = scored.groupBy("group_id").agg(
        F.max(
            F.struct(
                F.col(score_col).alias("_s"),
                (-F.col(id_col)).alias("_neg_id"),
            )
        ).alias("_w")
    ).select(
        "group_id", (-F.col("_w._neg_id")).alias("canonical_id")
    )
    return groups.join(winners, "group_id").select(
        id_col,
        "group_id",
        "canonical_id",
        (F.col(id_col) == F.col("canonical_id")).alias("keep"),
    )


def soft_dedup_weights(
    documents: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """SOFT dedup: instead of deleting near-duplicates, weight every
    document by ``1 / |its dedup group|`` so each distinct piece of
    content contributes unit mass to the training mixture regardless
    of how many copies the crawl collected — the down-weighting
    variant of SemDeDup-style curation (hard-delete loses benign
    template variation; soft weights keep it at fair mass).

    Returns ``(id, group_id, group_size, weight)`` for EVERY
    document (singletons get weight 1.0).  Weight is an exact
    integer reciprocal rounded to 6 dp, so the value is
    engine-stable and the gate query hash-matches.

    Cost on top of the component labels: one partial->final count on
    ``group_id`` and one broadcast-friendly join of the (group, size)
    table back onto the labels — sizes combine map-side, so a viral
    document (one giant group) collapses before the shuffle.
    """
    groups = near_dup_groups(documents, pairs, id_col=id_col)
    sizes = groups.groupBy("group_id").agg(
        F.count(F.lit(1)).alias("group_size")
    )
    return groups.join(sizes, "group_id").select(
        id_col,
        "group_id",
        "group_size",
        F.round(F.lit(1.0) / F.col("group_size"), 6).alias("weight"),
    )


def dedup_report_by_key(
    documents: DataFrame,
    groups: DataFrame,
    key_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Curation report: which slice of the corpus (source, crawl,
    domain, language — any ``key_col``) is CONTRIBUTING the
    near-duplicates.  Real pipelines act on this table — a source
    with a high dup rate gets down-weighted or dropped wholesale
    before the per-document pass spends compute on it.

    Input ``groups`` is the (id, group_id) output of
    ``near_dup_groups``; a doc is counted as a duplicate member when
    it is a non-representative member of its component
    (``id != group_id`` — exactly one survivor per group, so
    ``n_dup_members`` is the number of docs a group-level dedup
    would delete from that slice).

    Cost at corpus scale: one co-partitioned join on the id key
    (labels never carry text) and one partial->final aggregation on
    ``key_col`` — group counts combine map-side, so a skewed slice
    (one giant crawl) collapses to one row per partition before the
    shuffle.
    """
    flagged = documents.select(id_col, key_col).join(groups, id_col)
    is_dup = F.col(id_col) != F.col("group_id")
    return flagged.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(is_dup.cast("long")).alias("n_dup_members"),
        F.round(F.avg(is_dup.cast("double")), 6).alias("dup_rate"),
    )


#: PageRank works in pico-units (1e12) so 3+ rounds of integer
#: division keep ~6 significant digits at million-node graphs
_PR_UNIT = 1_000_000_000_000


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    n_iter: int = 3,
    damping_pct: int = 85,
    id_col: str = "doc_id",
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    directed: bool = False,
) -> DataFrame:
    """Fixed-iteration PageRank — the web-graph centrality prior
    large-scale corpus curation uses as a document quality signal
    (CCNet / RefinedWeb weight Common Crawl pages by link centrality
    before filtering; the reference has no graph surface at all).
    Over a near-dup pair graph it ranks cluster "hubs" — documents
    similar to many others — which is also a useful canonical-
    election signal.

    Exact integer arithmetic end to end: ranks live in pico-units
    (longs), each round computes

        r'(v) = (15 * r0) // 100 + (85 * S(v)) // 100,
        S(v)  = sum over in-neighbors u of (r(u) // outdeg(u))

    with ``r0 = 1e12 // N`` — floor divisions and long sums are
    order-independent, so the result is bit-identical on any engine
    and any partitioning (the BM25 micro-unit discipline; doubles
    would make every SUM accumulation-order-dependent).  Dangling
    mass is dropped, not redistributed — documented convention, same
    on the oracle side.  ``n_iter`` is FIXED (not convergence-tested):
    a bounded number of self-join rounds is the shape that survives a
    100 TB edge table, and 3 rounds separate hubs from leaves, which
    is all a quality prior needs.

    Scale shape per round: one shuffle to sum contributions on the
    destination key + one broadcast-or-AQE join of the <= N-row rank
    table back to the edge endpoints; the edge lineage executes once
    (symmetrization via explode, not union — see
    :func:`connected_components`).
    """
    if n_iter < 1 or not 0 <= damping_pct <= 100:
        raise ValueError("n_iter >= 1, damping_pct in [0, 100]")
    if directed:
        ends = edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        )
    else:
        ends = edges.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col(src_col).alias("src"),
                        F.col(dst_col).alias("dst"),
                    ),
                    F.struct(
                        F.col(dst_col).alias("src"),
                        F.col(src_col).alias("dst"),
                    ),
                )
            ).alias("e")
        ).select("e.src", "e.dst")
    ends = ends.localCheckpoint(eager=True)
    outdeg = ends.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))

    n = nodes.select(F.col(id_col).alias("node")).distinct()
    n = n.join(
        F.broadcast(n.agg(F.count(F.lit(1)).alias("_n")))
    ).localCheckpoint(eager=True)
    ranks = n.select(
        "node",
        "_n",
        F.expr(f"cast({_PR_UNIT} as bigint) div _n").alias("rank_pico"),
    )
    keep = 100 - damping_pct
    for it in range(n_iter):
        r = ranks.select("node", "rank_pico")
        contrib = (
            ends.join(r, ends["src"] == r["node"])
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("rank_pico div outdeg").alias("c"),
            )
        )
        incoming = contrib.groupBy("node").agg(
            F.sum("c").alias("s")
        )
        ranks = (
            n.join(incoming, "node", "left")
            .select(
                "node",
                "_n",
                (
                    F.expr(
                        f"({keep} * (cast({_PR_UNIT} as bigint) div _n))"
                        f" div 100"
                    )
                    + F.expr(
                        f"({damping_pct} * coalesce(s, cast(0 as bigint)))"
                        f" div 100"
                    )
                ).alias("rank_pico"),
            )
        )
        # cut the per-round join lineage before it compounds (the
        # connected_components discipline); 3-round callers never hit
        # this, long-horizon callers stay plannable
        if (it + 1) % 5 == 0 and it + 1 < n_iter:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select(
        F.col("node").alias(id_col),
        F.col("rank_pico").cast("long").alias("rank_pico"),
    )


def label_propagation(
    edges: DataFrame,
    seeds: DataFrame,
    n_rounds: int = 3,
    symmetrize: bool = True,
    src_col: str = "src",
    dst_col: str = "dst",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """Semi-supervised label propagation over a (kNN) graph — the
    weak-supervision step that turns a small labeled seed set into
    corpus-scale training labels (Zhu & Ghahramani 2002, majority-vote
    form): each round, every node takes the most common label among
    its in-neighbors' current labels; SEED labels are clamped (never
    overwritten); unreached nodes stay unlabeled until a labeled
    neighbor appears.  Ties break toward the SMALLER label — integer
    vote counts, so rounds are bit-deterministic on any engine or
    partitioning (no float damping, same design as the integer
    :func:`pagerank`).

    Output: ``(id, label, origin)`` with origin ``seed`` /
    ``propagated`` — one row per node that holds a label after
    ``n_rounds``.

    Scale: per round, ONE shuffle — the edge table joins the current
    O(labeled-nodes) label frame on ``src`` (labels are the small,
    shrinking-relative side; at kNN degree k the join output is
    bounded by k x labeled nodes), then a partial->final count agg on
    (dst, label) and a ``max_by`` argmax collapse to one row per dst.
    The label frame is localCheckpointed per round so plan depth and
    lineage stay flat over rounds — the :func:`pagerank` loop
    contract.  ``n_rounds`` is fixed (label diameter of interest),
    never a convergence poll.
    """
    if n_rounds < 1:
        raise ValueError(f"n_rounds must be >= 1, got {n_rounds}")
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )
    if symmetrize:
        # one explode pass, executed once (pagerank's symmetrization)
        e = e.select(
            F.explode(
                F.array(
                    F.struct(F.col("src"), F.col("dst")),
                    F.struct(
                        F.col("dst").alias("src"),
                        F.col("src").alias("dst"),
                    ),
                )
            ).alias("p")
        ).select("p.src", "p.dst").distinct()
    seed_frame = seeds.select(
        F.col(id_col).alias("node"), F.col(label_col).alias("label")
    ).localCheckpoint(eager=False)
    labels = seed_frame
    for _ in range(n_rounds):
        votes = (
            e.join(
                labels.select(
                    F.col("node").alias("src"), F.col("label")
                ),
                "src",
            )
            .groupBy("dst", "label")
            .agg(F.count(F.lit(1)).alias("n_votes"))
        )
        # majority label per node: most votes, tie -> smaller label
        prop = votes.groupBy("dst").agg(
            F.max_by(
                F.col("label"),
                F.struct(
                    F.col("n_votes"),
                    (-F.col("label")).alias("neg"),
                ),
            ).alias("label")
        )
        # seeds clamp; non-seed nodes take this round's majority
        labels = (
            seed_frame.select("node", "label")
            .unionByName(
                prop.join(
                    seed_frame.select(F.col("node")),
                    prop.dst == F.col("node"),
                    "left_anti",
                ).select(F.col("dst").alias("node"), "label")
            )
            .localCheckpoint(eager=False)
        )
    is_seed = seed_frame.select("node").withColumn(
        "origin", F.lit("seed")
    )
    return (
        labels.join(is_seed, "node", "left")
        .select(
            F.col("node").alias(id_col),
            F.col("label").alias(label_col),
            F.coalesce(F.col("origin"), F.lit("propagated")).alias(
                "origin"
            ),
        )
    )
