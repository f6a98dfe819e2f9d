"""The driver's correctness gate records exactly the FIRST 50
``queries()`` entries (observed in CORRECTNESS_r03/r04: 50 rows while
67/76 queries existed) — so the dict ORDER is a load-bearing contract:
the first 50 must stay a curated, oracle-complete set covering every
operator family, and everything past the gate window must still carry
its own check (oracle via the local driver-sim, or a pytest gate for
the rows-only sketches).  This test pins that contract so a reorder
or an append-in-the-wrong-block can't silently drop a family from the
driver's record."""

from __future__ import annotations

import itertools
from pathlib import Path

import __spark_entry__ as entry_mod

GATE_WINDOW = 50

# operator family -> queries that can represent it in the gate window.
# A family counts as covered if ANY of its members is in the first 50.
FAMILIES: dict[str, set[str]] = {
    "reference-windowed-agg": {
        "windowed_spending_per_customer",
        "windowed_spending_per_event",
    },
    "reference-daily-rollup": {"daily_spending_rollup", "daily_spending_direct"},
    "reference-json-decode": {"json_decode_props"},
    "olap-agg": {"pricing_summary", "monthly_order_stats", "order_priority_rollup"},
    "olap-join": {"revenue_by_nation"},
    "olap-grouped-topk": {"top_customers_per_nation"},
    # anti-join shape: parts_without_bulk (LEFT ANTI) rotated to
    # overflow in r8; lapsed_customers (EXCEPT -> anti-join under
    # Catalyst) pins the same physical family in the window
    "olap-anti-join": {"parts_without_bulk", "lapsed_customers"},
    "olap-pivot": {"order_status_pivot"},
    "olap-except": {"lapsed_customers"},
    "olap-multi-grain": {"multi_grain_rollup"},
    "olap-window-func": {"rolling_customer_spend", "customer_order_gaps"},
    "olap-cohort": {"cohort_retention", "customer_trend", "promo_revenue_share"},
    "sessions": {"user_sessions"},
    "asof-join": {"purchase_attribution", "purchase_prior_activity"},
    # r10 rotation (VERDICT r9 #4): family = operator module — the
    # salted-agg query and the skew diagnostic both live in
    # operators/skew.py; either pins the family in the window
    "skew": {"skewed_event_totals", "key_skew_report"},
    # operators/cdc.py: latest-per-key and snapshot_diff are the two
    # faces of change-data-capture
    "cdc": {"latest_event_per_user", "corpus_diff"},
    "scd2": {"scd2_user_state", "purchase_state_pit"},
    # operators/sampling.py: stratified/split/curriculum selection
    # (r11 adds the group-atomic split — same module)
    "sampling": {
        "stratified_sample",
        "split_assignment",
        "curriculum_order",
        "leakage_safe_split",
    },
    "quantiles": {"quantity_quantiles"},
    # the zero-shuffle regexp/map text family: any member pins the
    # codegen'd per-row-chain shape (r8 rotated the PII/repetition/
    # decontamination VARIANTS to overflow to make room for the
    # r6/r7 families below — VERDICT r7 #4)
    "text-stats": {"text_token_stats", "text_quality", "text_lang_id"},
    # operators/text.py token-statistics LM scoring: tf-idf, PMI and
    # the unigram-LM doc score share the tokenize->count->join shape
    # (r11 rotation)
    "text-tfidf-lm": {"tf_idf", "bigram_pmi", "unigram_lm_score"},
    "chunk-pack": {"packed_sequences", "chunk_dedup_docs"},
    "sketch-cms": {"cms_heavy_hitters"},
    "dedup-exact": {"exact_dedup_docs"},
    "dedup-minhash": {"minhash_near_dup"},
    "dedup-simhash": {"simhash_near_dup"},
    "dedup-ngram-jaccard": {"ngram_jaccard_pairs"},
    "dedup-graph": {"near_dup_groups", "canonical_docs"},
    "dedup-bloom-screen": {"bloom_screened_docs"},
    # operators/graph.py group-level weight/rate diagnostics over the
    # CC near-dup groups (r11: either face pins the family)
    "dedup-soft-weights": {"soft_dedup_weights", "dup_rate_by_source"},
    "ann-brute-topk": {"ann_cosine_topk"},
    # operators/similarity.py pairwise screens: random-hyperplane LSH
    # pairs and Voronoi-cell SemDeDup are the two access paths to the
    # same per-cell-quadratic pair scan (r11 rotation)
    "ann-lsh-pairs": {"embedding_similar_pairs", "semantic_dedup"},
    "ann-ivf": {"ivf_topk"},
    # operators/quantize.py: the ADC search and the encode that feeds
    # it (r11 rotation)
    "ann-pq": {"pq_topk_rerank", "pq_codes"},
    # same scoring tail, two access paths: the full-scan query and the
    # materialized-index partition-pruned query (identical output)
    "retrieval-bm25": {"bm25_topk", "bm25_topk_indexed"},
    "retrieval-rrf": {"hybrid_retrieval_rrf"},
    "graph-pagerank": {"pagerank_weights"},
    # operators/dsir.py: the selection and the raw importance weights
    # (r11 rotation)
    "selection-dsir": {"dsir_selected_docs", "dsir_doc_weights"},
    "classify-nb": {"nb_quality_scores"},
    "source-warc": {"wet_roundtrip_docs"},
    # operators/profile.py: drift alarm and column profiling
    "profiling": {"profile_drift_alarm", "table_profile"},
    "multimodal": {"multimodal_decode"},
    # r8 families rotated into the window in r9 (VERDICT r8 #4) —
    # registered here so a future rotation can't silently drop them.
    # The span family counts either the excision or the report query;
    # only one fits alongside every legacy family in 50 slots.
    "span-dedup": {
        "duplicate_span_docs",
        "duplicated_span_report",
        "incremental_span_dedup",
    },
    "text-normalize": {"normalized_docs"},
    "bpe": {"bpe_pair_stats"},
    "quality-rules": {"gopher_quality_flags"},
    "selection-budget": {"token_budget_selection"},
    "ann-hard-negatives": {"hard_negatives"},
    "graph-knn": {"knn_graph_edges"},
    "graph-label-prop": {"label_propagation"},
    "retrieval-batched": {"bm25_multi_query"},
}


def test_first_50_cover_every_family_and_are_oracle_gated():
    names = list(entry_mod.queries())
    assert len(names) >= GATE_WINDOW
    window = set(names[:GATE_WINDOW])
    oracles = entry_mod.oracle_sql()
    missing = {
        fam for fam, members in FAMILIES.items() if not (members & window)
    }
    assert not missing, f"families fell out of the driver gate window: {missing}"
    # oracle-complete: every gate-window query hash-checks against DuckDB
    unoracled = sorted(window - set(oracles))
    assert not unoracled, f"gate-window queries without an oracle: {unoracled}"


def test_every_overflow_query_is_still_checked():
    names = list(entry_mod.queries())
    oracles = entry_mod.oracle_sql()
    test_src = "\n".join(
        p.read_text() for p in Path(__file__).parent.glob("test_*.py")
    )
    for name in names[GATE_WINDOW:]:
        if name in oracles:
            continue  # local driver-sim verifies it against DuckDB
        assert name in entry_mod.NON_SQL_QUERIES, (
            f"{name} is past the gate window with neither an oracle "
            "nor a declared rows-only status"
        )
        assert name in test_src, (
            f"rows-only query {name} has no pytest gate mentioning it"
        )


# Rotation-ledger bound (VERDICT r10 #6): the number of SQL-oracled
# registry entries that have NEVER held a driver CORRECTNESS row must
# keep FALLING round over round, so gate curation converges instead of
# cycling the same families.  Each rotation round must lower this
# constant to its new never-gated count (r10: 24; r11 rotation: 18).
NEVER_DRIVER_GATED_MAX = 18


def test_never_driver_gated_count_is_bounded_and_falling():
    """Union every committed CORRECTNESS_r*.json with the CURRENT gate
    window (the next driver record is exactly the first 50 entries),
    and bound how many oracle-gated queries remain outside that union.
    A rotation that swaps families without retiring sim-only entries
    leaves the count flat and fails here."""
    import json

    names = list(entry_mod.queries())
    window = set(names[:GATE_WINDOW])
    gated: set[str] = set(window)
    for p in Path(entry_mod.__file__).parent.glob("CORRECTNESS_r*.json"):
        gated |= set(json.loads(p.read_text()))
    never = set(entry_mod.oracle_sql()) - gated
    assert len(never) <= NEVER_DRIVER_GATED_MAX, (
        f"{len(never)} oracle-gated queries have never been driver-"
        f"gated (bound {NEVER_DRIVER_GATED_MAX}); rotate some in or "
        f"lower the bound only with a real rotation: {sorted(never)}"
    )


def test_rows_only_set_is_exactly_the_tail():
    """NON_SQL queries sit LAST so they can never displace an
    oracle-gated query out of the driver's 50-row record."""
    names = list(entry_mod.queries())
    tail = names[-len(entry_mod.NON_SQL_QUERIES):]
    assert set(tail) == set(entry_mod.NON_SQL_QUERIES)
    # and every oracle key corresponds to a registered query
    dangling = set(entry_mod.oracle_sql()) - set(names)
    assert not dangling, f"oracle_sql keys with no queries() entry: {dangling}"
