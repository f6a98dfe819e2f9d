"""Scale-stress harness (VERDICT r4 #1): run the dedup chain and the
skewed aggregation on an ADVERSARIAL corpus 10x and 100x the size of
sf0.1, and turn "survives 100 TB" from plan-reading into measured
evidence:

- near-linear wall-time: each audited pipeline's wall at 100x must be
  <= LINEAR_HEADROOM x (10x wall x 10),
- no stragglers: in every heavy stage (>= MIN_TASKS tasks, median
  task >= MIN_MEDIAN_MS), max task time <= STRAGGLER_RATIO x median
  (read from the Spark UI REST task summaries),
- the hot-bucket cap holds: the boilerplate cluster's uncapped LSH
  candidate count grows ~quadratically while the capped pipeline's
  candidate count and wall stay ~linear, and (checked once) capping
  drops NO true near-dup pair on this corpus,
- salting is result-invariant: ``salted_sum`` totals equal the plain
  groupBy totals on a 30%-hot-key event table.

Adversarial corpus (deterministic — every token is a Catalyst
``xxhash64`` of (seed, id, position), so any run regenerates the same
bytes; no Python in the data path):

- 25% CLONE docs: clusters of 3 sharing a 30-token body with one
  mutated token per variant (pairwise 3-shingle Jaccard ~ 0.65, above
  the 0.5 threshold) — the true near-dup load for MinHash -> CC ->
  canonical election;
- 20% BOILERPLATE docs: a shared 20-token header + a unique 30-token
  body (pairwise Jaccard ~ 0.24, below threshold) — the classic
  shared-template shape that makes one LSH bucket per band collect
  ~20% of the header docs and degenerate the candidate join to N^2
  unless ``cap_hot_buckets`` drops it;
- 55% UNIQUE docs: 30 unique tokens each (the bulk that must flow
  through un-paired);
- events: 30% of rows on ONE hot key, the rest spread over 100K keys
  (the final-reducer-straggler shape ``salted_sum`` exists for).

Round 5 adds the EMBEDDING side (the text chain was stressed in r4's
run, the vector ops never above sf0.1's 2 K rows): k-means
quantization, SemDeDup semantic dedup, the LSH pair screen, and IVF
search on an adversarial vector corpus — clone clusters (true
near-dups), one dense blob (degenerate duplicate class), isotropic
bulk — all on the BLAS (`method="numpy"`) paths.

Usage:
    python scripts/scalecheck.py [--doc-scales 50000,500000]
        [--event-scales 1000000,10000000] [--embed-scales 20000,200000]
        [--out SCALECHECK.md] [--skip-uncapped]

Writes the markdown report (tables + pass/fail per assertion) to
--out and exits non-zero if any assertion fails.  Scratch parquet
lives under a tempdir and is removed on exit.
"""

from __future__ import annotations

import argparse
import json
import math
import shutil
import sys
import tempfile
import time
import urllib.request
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from kafka_sparkstreaming_sbt_spark.operators.dedup_fuzzy import (  # noqa: E402
    minhash_near_dup_pairs,
    minhash_signatures,
    with_shingles,
)
from kafka_sparkstreaming_sbt_spark.operators.graph import (  # noqa: E402
    select_canonical,
)
from kafka_sparkstreaming_sbt_spark.operators.similarity import (  # noqa: E402
    cosine_topk,
    incremental_semantic_dedup,
    ivf_kmeans_topk,
    kmeans_centroids,
    lsh_near_pairs,
    semantic_dedup,
)
from kafka_sparkstreaming_sbt_spark.operators.skew import (  # noqa: E402
    salted_sum,
)
from kafka_sparkstreaming_sbt_spark.plans import (  # noqa: E402
    parallelize_for_compute,
)
from kafka_sparkstreaming_sbt_spark.session import get_spark  # noqa: E402

LINEAR_HEADROOM = 2.0  # allowed superlinear factor over perfect 10x
STRAGGLER_RATIO = 10.0  # max task <= this x median task
MIN_TASKS = 8  # only audit stages with real parallelism
MIN_MEDIAN_MS = 200  # ignore trivial stages (scheduling noise)
VOCAB = 1_000_000  # token vocabulary size

CLONE_FRAC_NUM, CLONE_FRAC_DEN = 1, 4  # 25% clone docs (clusters of 3)
BOILER_FRAC_NUM, BOILER_FRAC_DEN = 1, 5  # 20% boilerplate docs
BODY_TOKENS = 30
HEADER_TOKENS = 20

EMB_DIM = 64
EMB_CLONE_EPS = 0.15  # intra-cluster cosine ~ 1/(1+eps^2) ~ 0.978
EMB_BLOB_EPS = 0.05  # blob cosine ~ 0.9975 (all true near-dups)
EMB_THRESHOLD = 0.9
EMB_CELL_CAP = 4000  # SemDeDup per-cell pairing cap
EMB_BUCKET_CAP = 3000  # LSH cap: excludes the blob bucket at BOTH scales


def _tok(*hash_args) -> F.Column:
    """Deterministic pseudo-random vocabulary token."""
    return F.concat(
        F.lit("w"), F.pmod(F.xxhash64(*hash_args), F.lit(VOCAB))
    )


def synth_documents(spark: SparkSession, n_docs: int) -> DataFrame:
    """Adversarial document table (doc_id, text, n_chars); see module
    docstring for the clone/boilerplate/unique layout."""
    n_clone = n_docs * CLONE_FRAC_NUM // CLONE_FRAC_DEN
    n_boiler = n_docs * BOILER_FRAC_NUM // BOILER_FRAC_DEN
    df = spark.range(n_docs).withColumnRenamed("id", "doc_id")
    doc_id = F.col("doc_id")
    is_clone = doc_id < n_clone
    is_boiler = (doc_id >= n_clone) & (doc_id < n_clone + n_boiler)
    cluster_id = (doc_id / 3).cast("long")
    variant = doc_id % 3
    # one mutated token per clone variant, at a variant-specific
    # position, so any two variants differ at exactly 2 of 30 tokens
    mut_pos = variant * 7
    body = F.transform(
        F.sequence(F.lit(0), F.lit(BODY_TOKENS - 1)),
        lambda j: F.when(
            is_clone,
            F.when(j == mut_pos, _tok(F.lit("mut"), doc_id)).otherwise(
                _tok(F.lit("c"), cluster_id, j)
            ),
        )
        .when(is_boiler, _tok(F.lit("b"), doc_id, j))
        .otherwise(_tok(F.lit("u"), doc_id, j)),
    )
    header = F.array(
        *[F.lit(f"hdr{i}") for i in range(HEADER_TOKENS)]
    )
    text = F.when(
        is_boiler, F.concat_ws(" ", F.concat(header, body))
    ).otherwise(F.concat_ws(" ", body))
    return df.select(
        "doc_id",
        text.alias("text"),
        F.length(text).alias("n_chars"),
    )


def _emb_rnd(tag: str, *cols) -> F.Column:
    """Deterministic pseudo-uniform double in [-1, 1]."""
    return (
        F.pmod(F.xxhash64(F.lit(tag), *cols), F.lit(2001)) - 1000
    ) / 1000.0


def synth_embeddings(spark: SparkSession, n_vecs: int) -> DataFrame:
    """Adversarial embedding table (vec_id, embedding float[EMB_DIM]):

    - 25% CLONE vectors: clusters of 3 around a shared base, each
      perturbed by EMB_CLONE_EPS — intra-cluster cosine ~
      1/(1+eps^2) ~ 0.978, above the 0.9 threshold (the true
      near-dup load for SemDeDup / embedding LSH);
    - 20% BLOB vectors: ONE dense region at EMB_BLOB_EPS (pairwise
      cosine ~ 0.9975 — every blob pair is a true near-dup): the
      degenerate duplicate-class pileup that turns a naive per-cell /
      per-bucket quadratic into N^2;
    - 55% UNIQUE vectors: isotropic (random-pair cosine ~ N(0, 1/64),
      so a false positive at 0.9 is a >7-sigma event)."""
    n_clone = n_vecs * CLONE_FRAC_NUM // CLONE_FRAC_DEN
    n_blob = n_vecs * BOILER_FRAC_NUM // BOILER_FRAC_DEN
    df = spark.range(n_vecs).withColumnRenamed("id", "vec_id")
    vid = F.col("vec_id")
    is_clone = vid < n_clone
    is_blob = (vid >= n_clone) & (vid < n_clone + n_blob)
    cluster = (vid / 3).cast("long")
    dims = F.sequence(F.lit(0), F.lit(EMB_DIM - 1))
    vec = F.transform(
        dims,
        lambda j: F.when(
            is_clone,
            _emb_rnd("c", cluster, j)
            + EMB_CLONE_EPS * _emb_rnd("n", vid, j),
        )
        .when(
            is_blob,
            _emb_rnd("p", j) + EMB_BLOB_EPS * _emb_rnd("n", vid, j),
        )
        .otherwise(_emb_rnd("u", vid, j))
        .cast("float"),
    )
    return df.select("vec_id", vec.alias("embedding"))


def synth_events(spark: SparkSession, n_events: int) -> DataFrame:
    """Skewed event table: user 0 owns 30% of all rows."""
    df = spark.range(n_events).withColumnRenamed("id", "event_id")
    eid = F.col("event_id")
    user = F.when(eid % 10 < 3, F.lit(0)).otherwise(
        F.pmod(F.xxhash64(F.lit("usr"), eid), F.lit(100_000)) + 1
    )
    return df.select(
        "event_id",
        user.alias("user_id"),
        (F.pmod(F.xxhash64(F.lit("val"), eid), F.lit(1000)) / 100.0).alias(
            "value"
        ),
    )


# ---------------------------------------------------------------- metrics


def _api(spark: SparkSession, path: str):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app}{path}"
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.load(r)


def _max_stage_id(spark: SparkSession) -> int:
    try:
        stages = _api(spark, "/stages")
        return max((s["stageId"] for s in stages), default=-1)
    except Exception:
        return -1


def straggler_audit(spark: SparkSession, since_stage: int) -> list[dict]:
    """max/median task-duration ratio for the heaviest completed
    stages after ``since_stage`` (Spark UI REST taskSummary)."""
    try:
        stages = _api(spark, "/stages?status=complete")
    except Exception as e:  # UI off or API shape drift: report, don't die
        return [{"error": f"stage API unavailable: {e}"}]
    heavy = [
        s
        for s in stages
        if s["stageId"] > since_stage
        and s.get("numCompleteTasks", 0) >= MIN_TASKS
    ]
    heavy.sort(key=lambda s: -s.get("executorRunTime", 0))
    out = []
    for s in heavy[:8]:
        try:
            ts = _api(
                spark,
                f"/stages/{s['stageId']}/{s['attemptId']}/taskSummary"
                "?quantiles=0.0,0.5,1.0",
            )
        except Exception:
            continue
        dur = ts.get("executorRunTime") or ts.get("duration")
        if not dur or len(dur) != 3:
            continue
        _mn, med, mx = dur
        if med < MIN_MEDIAN_MS:
            continue
        out.append(
            {
                "stage": s["stageId"],
                "tasks": s["numCompleteTasks"],
                "median_ms": round(med, 1),
                "max_ms": round(mx, 1),
                "ratio": round(mx / max(med, 1e-9), 2),
                "name": (s.get("name") or "")[:60],
            }
        )
    return out


def timed_noop(df: DataFrame) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def timed_noop_min2(df: DataFrame) -> float:
    """min-of-2 for CHEAP walls that feed near-linearity gates: a
    single-run wall on this VM can eat a host stall an order of
    magnitude above steady state (measured r10: the 10M-order RANGE
    window read 21.85 s in the harness and 1.2 s standalone minutes
    later), turning a scaling gate into a coin flip.  The expensive
    section walls stay single-run — a stall is visible against their
    minutes-long baselines, and doubling them would double the
    harness."""
    return min(timed_noop(df), timed_noop(df))


def timed_parquet(df: DataFrame, path: str) -> float:
    t0 = time.perf_counter()
    df.write.mode("overwrite").parquet(path)
    return time.perf_counter() - t0


def bucket_profile(spark: SparkSession, docs: DataFrame) -> dict:
    """LSH bucket-size distribution BEFORE capping: the uncapped
    candidate-pair count sum(n*(n-1)/2) is computed from bucket sizes
    alone (one agg — no quadratic join is ever executed)."""
    sh = with_shingles(parallelize_for_compute(docs), "text", 3).select(
        "doc_id", "shingles"
    )
    sigs = minhash_signatures(sh, 8).select(
        F.xxhash64("band", "sig").alias("bs")
    )
    row = (
        sigs.groupBy("bs")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.max("n").alias("max_bucket"),
            F.sum(F.col("n") * (F.col("n") - 1) / 2).alias(
                "uncapped_candidates"
            ),
            F.sum(
                F.when(
                    F.col("n") > 50, F.col("n") * (F.col("n") - 1) / 2
                ).otherwise(0)
            ).alias("candidates_in_hot_buckets"),
        )
        .collect()[0]
    )
    return {
        "max_bucket": row["max_bucket"],
        "uncapped_candidates": int(row["uncapped_candidates"]),
        "candidates_in_hot_buckets": int(row["candidates_in_hot_buckets"]),
    }


# ---------------------------------------------------------------- phases


def run_doc_scale(
    spark: SparkSession, n_docs: int, scratch: str, audits: list
) -> dict:
    d = {"n_docs": n_docs}
    doc_path = f"{scratch}/docs_{n_docs}"
    pair_path = f"{scratch}/pairs_{n_docs}"
    synth_documents(spark, n_docs).repartition(32).write.mode(
        "overwrite"
    ).parquet(doc_path)
    docs = spark.read.parquet(doc_path)
    d["profile"] = bucket_profile(spark, docs)

    since = _max_stage_id(spark)
    t0 = time.perf_counter()
    pairs = minhash_near_dup_pairs(
        docs, shingle_n=3, n_bands=8, threshold=0.5, max_bucket_size=50
    )
    pairs.write.mode("overwrite").parquet(pair_path)
    d["pairs_wall_s"] = round(time.perf_counter() - t0, 2)
    audits.append(
        (f"minhash pairs @ {n_docs}", straggler_audit(spark, since))
    )
    pairs_pq = spark.read.parquet(pair_path)
    d["n_pairs"] = pairs_pq.count()

    since = _max_stage_id(spark)
    t0 = time.perf_counter()
    canon = select_canonical(
        docs, pairs_pq.select("doc_a", "doc_b"), score_col="n_chars"
    )
    canon.write.format("noop").mode("overwrite").save()
    d["canonical_wall_s"] = round(time.perf_counter() - t0, 2)
    audits.append(
        (f"CC + canonical @ {n_docs}", straggler_audit(spark, since))
    )

    # recall on the KNOWN clone clusters: every cluster of 3 should
    # contribute its 3 intra-cluster pairs (J ~ 0.65 >= 0.5), and the
    # hot-bucket cap must not have eaten them
    n_clone = n_docs * CLONE_FRAC_NUM // CLONE_FRAC_DEN
    expected = (
        # full clusters of 3 contribute 3 pairs; a trailing partial
        # cluster of 2 contributes 1
        (n_clone // 3) * 3
        + (1 if n_clone % 3 == 2 else 0)
    )
    found = pairs_pq.filter(
        (F.col("doc_a") < n_clone)
        & (F.col("doc_b") < n_clone)
        & ((F.col("doc_a") / 3).cast("long") == (F.col("doc_b") / 3).cast("long"))
    ).count()
    d["clone_pairs_expected"] = expected
    d["clone_pairs_found"] = found
    d["clone_recall"] = round(found / max(expected, 1), 4)
    # false positives: pairs not inside a clone cluster (boilerplate
    # docs share only the header, J ~ 0.24 — none should pass 0.5)
    d["non_clone_pairs"] = d["n_pairs"] - found
    return d


def run_span_dedup_scale(
    spark: SparkSession, n_docs: int, scratch: str, audits: list
) -> dict:
    """ExactSubstr-style duplicated-span excision at scale
    (``remove_duplicate_spans``, W=16): the synthetic corpus layout
    makes the CORRECT output provable per doc class, so the gates are
    exact mismatch counts rather than recall estimates —

    - boilerplate docs share the 20-token header at offset 0
      (windows 0..4 duplicated, islands merge to span [0, 20)), PLUS
      a birthday-collision allowance the first run of this gate
      taught us: a header-STRADDLING window (15 header tokens + the
      first k body tokens) genuinely matches between two boiler docs
      whenever their first body token collides in the 1M-token
      vocabulary — expected affected docs ~ n_boiler^2 * 1e-6 (measured
      104 of 10,000 @ 50K docs, 9,553 of 100,000 @ 500K — both on
      theory), and excising those windows is CORRECT behavior.  The
      gate therefore accepts ONE span starting at 0 that eats the
      header plus at most 3 leading body tokens, and requires the
      clean text to be exactly the corresponding body suffix
      (overshoot >= 2 needs two CONSECUTIVE collisions,
      ~n_boiler^2 * 1e-12 pairs — allow 3 and report the overshoot
      count);
    - clone variants 0/1 differ at positions 0 and 7 only, so the one
      >=16-token run they share is tokens 8..29 (windows 8..14 -> span
      [8, 30)): 1 span, 22 tokens removed, first 8 tokens survive;
    - variant 2 (mutation at 14) shares NO 16-token window with either
      sibling (any window avoiding {0,14} or {7,14} is shorter than
      16) and must come through whole — the precision gate;
    - unique docs must come through whole."""
    from kafka_sparkstreaming_sbt_spark.operators.chunking import (
        remove_duplicate_spans,
    )

    d = {"n_docs": n_docs}
    docs = spark.read.parquet(f"{scratch}/docs_{n_docs}")
    out_path = f"{scratch}/spans_{n_docs}"
    since = _max_stage_id(spark)
    t0 = time.perf_counter()
    remove_duplicate_spans(docs, window_tokens=16, min_docs=2).write.mode(
        "overwrite"
    ).parquet(out_path)
    d["wall_s"] = round(time.perf_counter() - t0, 2)
    audits.append(
        (f"span dedup @ {n_docs}", straggler_audit(spark, since))
    )

    n_clone = n_docs * CLONE_FRAC_NUM // CLONE_FRAC_DEN
    n_boiler = n_docs * BOILER_FRAC_NUM // BOILER_FRAC_DEN
    out = spark.read.parquet(out_path).join(
        docs.select("doc_id", "text"), "doc_id"
    )
    toks = F.split(F.col("text"), " ")
    did = F.col("doc_id")
    has_v1 = ((did / 3).cast("long") * 3 + 1) < n_clone
    clone01 = (did < n_clone) & (did % 3 < 2) & has_v1
    clone_whole = (did < n_clone) & ~clone01
    boiler = (did >= n_clone) & (did < n_clone + n_boiler)
    unique = did >= n_clone + n_boiler
    ok_whole = (F.col("tokens_removed") == 0) & (
        F.col("clean_text") == F.col("text")
    )
    ok_boiler = (
        (F.col("n_spans") == 1)
        & (F.col("tokens_removed") >= HEADER_TOKENS)
        & (F.col("tokens_removed") <= HEADER_TOKENS + 3)
        & (
            F.col("clean_text")
            == F.array_join(
                F.slice(
                    toks,
                    F.col("tokens_removed") + 1,
                    F.lit(BODY_TOKENS),
                ),
                " ",
            )
        )
    )
    boiler_overshoot = boiler & (
        F.col("tokens_removed") > HEADER_TOKENS
    )
    ok_clone01 = (
        (F.col("n_spans") == 1)
        & (F.col("tokens_removed") == BODY_TOKENS - 8)
        & (F.col("clean_text") == F.array_join(F.slice(toks, 1, 8), " "))
    )

    def bad(cond, ok):
        return F.sum((cond & ~ok).cast("long"))

    row = out.agg(
        bad(boiler, ok_boiler).alias("bad_boiler"),
        bad(clone01, ok_clone01).alias("bad_clone01"),
        bad(clone_whole, ok_whole).alias("bad_clone_whole"),
        bad(unique, ok_whole).alias("bad_unique"),
        F.sum(boiler_overshoot.cast("long")).alias(
            "boiler_collision_docs"
        ),
        F.sum(F.col("tokens_removed")).alias("tokens_removed_total"),
    ).collect()[0]
    d.update({k: int(row[k] or 0) for k in row.asDict()})
    d["mismatches"] = (
        d["bad_boiler"]
        + d["bad_clone01"]
        + d["bad_clone_whole"]
        + d["bad_unique"]
    )
    return d


def run_bpe_scale(
    spark: SparkSession, n_docs: int, scratch: str, audits: list
) -> dict:
    """BPE merge training at scale: the synthetic corpus draws its
    tokens from a 1M-slot vocabulary, so word TYPES approach 10^6 at
    the big scale — the vocabulary-sized rounds run over a genuinely
    large table.  Gates:

    - **determinism under partitioning**: retraining on a
      repartition(7) of the same corpus yields a bit-identical merge
      table (the argmax total order (count DESC, left, right) is the
      whole point);
    - **argmax monotonicity**: pair_count is non-increasing in
      merge_rank — a merged pair's successor pairs can never beat the
      maximum that produced them;
    - full 8-row table (the corpus is never too small to merge);
    - **production depth** (r9): the driver-local trainer
      (bpe_train_merges_local — merge loop over the collected
      word-TYPE table, the PQ-codebook bounded-artifact pattern)
      trains 1,000 merges with its first 8 EXACTLY equal to the
      distributed trainer's table, wall recorded — the regime where
      the two-jobs-per-round distributed loop would pay ~2,000
      sequential driver round-trips."""
    from kafka_sparkstreaming_sbt_spark.operators.bpe import (
        bpe_train_merges,
        bpe_train_merges_local,
    )

    d = {"n_docs": n_docs}
    docs = spark.read.parquet(f"{scratch}/docs_{n_docs}")
    since = _max_stage_id(spark)
    t0 = time.perf_counter()
    merges = [
        (r.merge_rank, r.left, r.right, r.pair_count)
        for r in bpe_train_merges(docs, n_merges=8)
        .orderBy("merge_rank")
        .collect()
    ]
    d["wall_s"] = round(time.perf_counter() - t0, 2)
    audits.append(
        (f"bpe training @ {n_docs}", straggler_audit(spark, since))
    )
    again = [
        (r.merge_rank, r.left, r.right, r.pair_count)
        for r in bpe_train_merges(docs.repartition(7), n_merges=8)
        .orderBy("merge_rank")
        .collect()
    ]
    d["n_merges"] = len(merges)
    d["deterministic"] = int(merges == again)
    counts = [m[3] for m in merges]
    d["monotone"] = int(
        all(a >= b for a, b in zip(counts, counts[1:]))
    )
    d["top_pair_count"] = counts[0] if counts else 0
    t0 = time.perf_counter()
    deep = [
        (r.merge_rank, r.left, r.right, r.pair_count)
        for r in bpe_train_merges_local(docs, n_merges=1000)
        .orderBy("merge_rank")
        .collect()
    ]
    d["local_wall_s"] = round(time.perf_counter() - t0, 2)
    d["local_n_merges"] = len(deep)
    d["local_prefix_equal"] = int(deep[: len(merges)] == merges)
    # the depth runner gates its 16K+ table's prefix against this
    # one; underscore key is popped before the dict is serialized
    d["_local_table"] = deep
    return d


def run_bpe_depth(
    spark: SparkSession,
    n_docs: int,
    scratch: str,
    prefix_table: list,
    n_merges: int = 16_384,
) -> dict:
    """Production-depth BPE rounds-scaling (VERDICT r9 #3): real
    tokenizers train 30K-100K merges, and every prior gate stopped at
    1,000 — the per-merge cost model (incremental pair counts + lazy
    max-heap, cost proportional to the affected type set and
    independent of rounds already trained) was argued but never
    measured past that point.  This runner measures the ROUNDS axis
    on the small corpus (corpus-size scaling is run_bpe_scale's
    50K-vs-500K gate):

    - ``wall_s`` for ``n_merges`` merges in one
      :func:`bpe_train_merges_local` call; gated against
      ``(n_merges/1000) x wall(1000)`` — if the heap's lazily-deleted
      stale entries or the per-word rank scans degraded with depth,
      the average per-merge cost would EXCEED the 1,000-merge run's
      (in reality it falls: the vocabulary collect amortizes and
      deeper, rarer pairs touch fewer word types);
    - exact 1,000-prefix equality vs run_bpe_scale's table (same
      total order, same greedy pass, independent run);
    - the ENCODE tier at full depth:
      ``bpe_vocab_tokens(method='local')`` applies the whole table
      per word type by lowest-rank-first search — every word must
      reconstruct exactly (concat(tokens) == word), wall recorded.
    """
    from kafka_sparkstreaming_sbt_spark.operators.bpe import (
        bpe_train_merges_local,
        bpe_vocab_tokens,
    )

    docs = spark.read.parquet(f"{scratch}/docs_{n_docs}")
    d = {"n_docs": n_docs, "n_merges_requested": n_merges}
    t0 = time.perf_counter()
    merges_df = bpe_train_merges_local(docs, n_merges=n_merges)
    deep = [
        (r.merge_rank, r.left, r.right, r.pair_count)
        for r in merges_df.orderBy("merge_rank").collect()
    ]
    d["wall_s"] = round(time.perf_counter() - t0, 2)
    d["n_merges"] = len(deep)
    d["prefix_1000_equal"] = int(
        deep[: len(prefix_table)] == prefix_table
    )
    counts = [m[3] for m in deep]
    d["monotone"] = int(all(a >= b for a, b in zip(counts, counts[1:])))
    t0 = time.perf_counter()
    vocab = bpe_vocab_tokens(docs, merges_df, method="local")
    d["encode_mismatches"] = vocab.filter(
        F.array_join("tokens", "") != F.col("word")
    ).count()
    d["encode_wall_s"] = round(time.perf_counter() - t0, 2)
    return d


def run_bloom_scale(
    spark: SparkSession, n_docs: int, scratch: str,
    batch_docs: int = 20_000,
) -> dict:
    """Bloom exact-screen economics — the operator's actual claim,
    measured: once the bitmap + hash table exist (the streaming
    screen materializes them in the lake, streaming/ingest.py), the
    per-batch cost scales with the ~33-byte/doc HASH ARTIFACT the
    exact-confirm join scans, not with the ~KB/doc corpus TEXT the
    plain anti-join re-scans — bloom negatives (the bulk of a
    healthy batch) never join at all.  This runner is called at two
    corpus scales with the SAME ``batch_docs`` so main() can gate
    (a) the artifact-vs-text byte ratio on disk and (b) that the
    screen's per-batch wall grows no faster than the baseline's
    across a 10x corpus (r7 measured 1.6x vs 2.9x).  Absolute
    screen-vs-anti-join wall is NOT gated: at harness scale the
    whole corpus sits in page cache, making the baseline's re-scan
    nearly free — the trade a 100 TB corpus inverts.  Hard gates per
    corpus: exact verdict parity with the baseline on every batch,
    measured fp within 3x the 1% target, and the DETERMINISTIC slice
    gate — the exact confirm join may touch only the positive slice
    (true dups + ~fpp of the new docs)."""
    from kafka_sparkstreaming_sbt_spark.operators.bloom import (
        build_bloom,
        with_bloom_flag,
    )

    d = {"n_docs": n_docs, "batch_docs": batch_docs}
    corpus_path = f"{scratch}/bloomdocs_{n_docs}"
    synth_documents(spark, n_docs).repartition(32).write.mode(
        "overwrite"
    ).parquet(corpus_path)
    corpus = spark.read.parquet(corpus_path).select("doc_id", "text")

    # one-time artifacts (what the ingest screen materializes)
    t0 = time.perf_counter()
    bloom = build_bloom(corpus, "text", expected_items=n_docs, fpp=0.01)
    d["bloom_build_wall_s"] = round(time.perf_counter() - t0, 2)
    d["bloom_bitmap_mb"] = round(len(bloom[0]) / 1e6, 2)
    # saturation-probe economics (r8): one fancy-index numpy pass at
    # fold time is the entire recurring cost of density monitoring —
    # time it at this bitmap size, and gate measured fill against the
    # analytic expectation 1-exp(-kn/m) (a corpus-scale determinism
    # check on the whole double-hash + tree-reduce path)
    from kafka_sparkstreaming_sbt_spark.operators.bloom import (
        bloom_fill_fraction,
    )

    t0 = time.perf_counter()
    fill = bloom_fill_fraction(bloom[0])
    d["fill_probe_wall_s"] = round(time.perf_counter() - t0, 4)
    d["fill_fraction"] = round(fill, 4)
    d["fill_expected"] = round(
        1.0 - math.exp(-bloom[2] * n_docs / bloom[1]), 4
    )
    d["fill_matches_theory"] = abs(fill - d["fill_expected"]) < 0.02
    hash_path = f"{scratch}/bloomhash_{n_docs}"
    t0 = time.perf_counter()
    corpus.select(F.md5("text").alias("h")).write.mode(
        "overwrite"
    ).parquet(hash_path)
    d["hash_build_wall_s"] = round(time.perf_counter() - t0, 2)
    d["corpus_bytes"] = _dir_bytes(corpus_path)
    d["hash_bytes"] = _dir_bytes(hash_path)
    hashes = spark.read.parquet(hash_path)

    # 3 ingest batches of FIXED size (same across corpus scales so
    # per-batch walls compare): half exact re-crawls of corpus
    # uniques (the same slice each batch — duplicate detection does
    # not care), half genuinely new texts that vary per batch
    nb2 = batch_docs // 2
    lo = n_docs * 6 // 10  # inside the unique-text region
    if lo + nb2 > n_docs:
        raise ValueError("corpus too small for the fixed batch size")
    screen_walls, base_walls = [], []
    parity_ok, n_pos_total, n_pos_max = True, 0, 0
    for b in range(3):
        dups = (
            corpus.filter(
                (F.col("doc_id") >= lo) & (F.col("doc_id") < lo + nb2)
            ).select(
                (F.col("doc_id") + 20 * n_docs).alias("doc_id"), "text"
            )
        )
        news = spark.range(nb2).select(
            (F.col("id") + (10 + b) * n_docs).alias("doc_id"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(0), F.lit(BODY_TOKENS - 1)),
                    lambda j: _tok(F.lit(f"new{b}"), F.col("id"), j),
                ),
            ).alias("text"),
        )
        batch = dups.unionByName(news).localCheckpoint(eager=True)

        t0 = time.perf_counter()
        # ONE bloom pass per batch, materialized — both the negative
        # fast path and the positive confirm slice then read the
        # checkpointed flag instead of re-running the mapInArrow test
        # (exactly what the ingest screen's foreachBatch does)
        flagged = with_bloom_flag(batch, "text", bloom).localCheckpoint(
            eager=True
        )
        negatives = flagged.filter(~F.col("bloom_maybe")).drop(
            "bloom_maybe"
        )
        positives = flagged.filter(F.col("bloom_maybe")).drop(
            "bloom_maybe"
        )
        survived = negatives.unionByName(
            positives.join(
                hashes,
                F.md5(positives["text"]) == hashes["h"],
                "left_anti",
            )
        )
        got = sorted(r.doc_id for r in survived.collect())
        screen_walls.append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        exp = sorted(
            r.doc_id
            for r in batch.join(corpus, "text", "left_anti")
            .select("doc_id")
            .collect()
        )
        base_walls.append(time.perf_counter() - t0)
        parity_ok &= got == exp
        # positives beyond the true dups are bloom false positives
        n_pos = flagged.filter(F.col("bloom_maybe")).count()
        n_pos_max = max(n_pos_max, n_pos)
        n_pos_total += n_pos - nb2

    d["screen_wall_s"] = round(sum(screen_walls) / 3, 2)
    d["antijoin_wall_s"] = round(sum(base_walls) / 3, 2)
    d["screen_wall_min_s"] = round(min(screen_walls), 2)
    d["antijoin_wall_min_s"] = round(min(base_walls), 2)
    d["parity_ok"] = parity_ok
    d["fp_rate"] = round(n_pos_total / (3 * nb2), 4)
    d["n_batch"] = 2 * nb2
    # worst-batch confirm-slice size vs the deterministic budget:
    # nb2 true dups + 3x the 1% fpp target on the nb2 new docs
    d["confirm_rows_worst"] = n_pos_max
    d["confirm_rows_budget"] = nb2 + int(3 * 0.01 * nb2)
    return d


def run_wet_scale(spark: SparkSession, n_pages: int, scratch: str) -> dict:
    """WARC/WET ingest at scale: synthesize ``n_pages`` pages as
    per-record-gzip WET archives (the Common Crawl layout, 32
    segments) and measure the parse leg — pages/s and MB/s through
    ``binaryFile`` + the pure-Python record parser.  Generation runs
    DISTRIBUTED (one applyInPandas task per segment writes its file;
    local FS here models the shared filesystem executors write on a
    cluster); the measured leg is the read side only.  Gates: every
    page parses (count == n_pages, zero dead letters) and wall stays
    near-linear across scales."""
    import os

    import pandas as pd

    from kafka_sparkstreaming_sbt_spark.sources.warc import (
        parse_warc_records,
        read_wet,
        wet_bytes,
    )

    n_files = 32
    seg_dir = f"{scratch}/wet_{n_pages}"
    os.makedirs(seg_dir, exist_ok=True)

    def build(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        seg = int(key[0])
        pdf = pdf.sort_values("id")
        recs = [
            (
                f"http://crawl.example/{int(i)}",
                f"page {int(i)} body " + "tok ".join(
                    str((int(i) * 31 + j) % 997) for j in range(40)
                ),
            )
            for i in pdf["id"]
        ]
        with open(f"{seg_dir}/seg{seg:05d}.warc.wet.gz", "wb") as f:
            f.write(wet_bytes(recs, compress=True))
        return pd.DataFrame({"seg": [seg], "n": [len(recs)]})

    made = (
        spark.range(n_pages)
        .withColumn("seg", (F.col("id") % n_files).cast("int"))
        .groupBy("seg")
        .applyInPandas(build, "seg int, n long")
        .agg(F.sum("n"))
        .first()[0]
    )
    total_bytes = sum(
        os.path.getsize(f"{seg_dir}/{f}") for f in os.listdir(seg_dir)
    )

    t0 = time.perf_counter()
    parsed = read_wet(spark, seg_dir).count()
    wall = round(time.perf_counter() - t0, 2)
    dead = (
        parse_warc_records(
            spark.read.format("binaryFile").load(seg_dir)
        )
        .filter(F.col("error").isNotNull())
        .count()
    )
    return {
        "n_pages": n_pages,
        "generated": int(made),
        "parsed": parsed,
        "dead_letters": dead,
        "gzip_mb": round(total_bytes / 1024 / 1024, 1),
        "parse_wall_s": wall,
        "pages_per_sec": round(n_pages / max(wall, 1e-9), 0),
        "mb_per_sec": round(
            total_bytes / 1024 / 1024 / max(wall, 1e-9), 1
        ),
    }


def run_selection_scale(
    spark: SparkSession, n_docs: int, scratch: str
) -> dict:
    """Data-selection operators at scale: DSIR importance resampling
    and the NB quality filter over the synthetic corpus, with QUALITY
    gates the synthetic layout makes exact — boilerplate docs share a
    20-token header (a recognizable "domain"), clones/uniques share
    nothing, so a target seed of boilerplate docs must pull the other
    boilerplate docs to the top of the DSIR ranking, and an NB model
    labeled on boilerplate-ness must classify near-perfectly.  Wall
    times feed the near-linearity table: both operators are one
    explode + bounded-model broadcast joins, the shape that must stay
    linear at 100 TB."""
    from kafka_sparkstreaming_sbt_spark.operators.classify import (
        nb_score,
        nb_train,
    )
    from kafka_sparkstreaming_sbt_spark.operators.dsir import dsir_select

    docs = spark.read.parquet(f"{scratch}/docs_{n_docs}")
    n_clone = n_docs * CLONE_FRAC_NUM // CLONE_FRAC_DEN
    n_boiler = n_docs * BOILER_FRAC_NUM // BOILER_FRAC_DEN
    doc_id = F.col("doc_id")
    is_boiler = (doc_id >= n_clone) & (doc_id < n_clone + n_boiler)
    d = {"n_docs": n_docs}

    # DSIR: seed = first 5% of the boilerplate slice; the raw pool is
    # everything else; on-domain = the remaining boilerplate docs
    n_target = max(50, n_boiler // 20)
    target = docs.filter(doc_id < n_clone + n_target).filter(is_boiler)
    raw = docs.filter(~(is_boiler & (doc_id < n_clone + n_target)))
    n_keep = (n_boiler - n_target) // 2
    t0 = time.perf_counter()
    sel = dsir_select(raw, target, n_keep, n_buckets=4096).collect()
    d["dsir_wall_s"] = round(time.perf_counter() - t0, 2)
    on = sum(
        1
        for r in sel
        if n_clone + n_target <= r["doc_id"] < n_clone + n_boiler
    )
    d["dsir_n_selected"] = len(sel)
    d["dsir_on_domain_frac"] = round(on / max(len(sel), 1), 4)

    # NB quality filter: label = boilerplate-ness; the header tokens
    # are a perfect linear signal, so accuracy gates near 1.0
    labeled = docs.withColumn("label", is_boiler.cast("int"))
    t0 = time.perf_counter()
    model = nb_train(labeled, "label", n_buckets=4096)
    scored = nb_score(docs, model, n_buckets=4096)
    stats = (
        scored.join(labeled.select("doc_id", "label"), "doc_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (F.col("predicted") == F.col("label")).cast("long")
            ).alias("ok"),
        )
        .first()
    )
    d["nb_wall_s"] = round(time.perf_counter() - t0, 2)
    d["nb_accuracy"] = round(stats["ok"] / max(stats["n"], 1), 4)
    return d


def run_budget_scale(spark: SparkSession, n_docs: int) -> dict:
    """Token-budget selection at scale: the bucketed prefix-sum plan
    must select EXACTLY the rows the textbook global-window reference
    selects (the output is a pure function of the total order, so any
    divergence is a bug, not noise), and wall time must stay
    near-linear — the reference itself is the single-partition window
    this operator exists to avoid, so it is only ever run HERE, as a
    gate."""
    from kafka_sparkstreaming_sbt_spark.operators.sampling import (
        select_to_token_budget,
    )
    from pyspark.sql import Window

    base = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        (
            F.pmod(F.xxhash64(F.lit("s"), F.col("id")), F.lit(1000001))
            / 1000000.0
        ).alias("score"),
        (F.pmod(F.xxhash64(F.lit("w"), F.col("id")), F.lit(200)) + 20)
        .cast("long")
        .alias("w"),
    ).localCheckpoint(eager=True)
    budget = int(n_docs * 119.5 * 0.3)  # ~30% of expected total weight
    t0 = time.perf_counter()
    sel = select_to_token_budget(base, budget, "w", "score")
    n_sel = sel.count()
    wall = round(time.perf_counter() - t0, 2)
    w_ref = (
        Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ref = (
        base.select(
            "doc_id",
            "score",
            F.col("w"),
            (F.sum("w").over(w_ref) - F.col("w")).alias("run_before"),
        )
        .filter(F.col("run_before") < budget)
    )
    mism = (
        sel.exceptAll(ref).count() + ref.exceptAll(sel).count()
    )
    return {
        "n_docs": n_docs,
        "budget": budget,
        "budget_wall_s": wall,
        "budget_n_selected": n_sel,
        "budget_parity_mismatches": mism,
    }


def run_graph_scale(spark: SparkSession, n_vecs: int) -> dict:
    """Cell-blocked kNN graph + label propagation at scale, on the
    clustered corpus (the shape real embedding models produce):

    - blocked 10-NN graph over ALL n_vecs vectors (every vector is
      query and corpus — the Q=N shape the brute-force tier cannot
      broadcast); recall gated >= 0.9 against the exact neighbors of
      a 256-vector sample;
    - 3 rounds of label propagation over those edges, seeded with
      0.5% of nodes carrying their planted cluster id: propagated
      accuracy must be ~1.0 (edges are intra-cluster by
      construction), and a repartitioned rerun must be
      bit-identical (integer votes)."""
    from kafka_sparkstreaming_sbt_spark.operators.graph import (
        label_propagation,
    )
    from kafka_sparkstreaming_sbt_spark.operators.similarity import (
        cosine_topk,
        knn_graph,
    )

    n_clusters = max(4, int(n_vecs**0.5) // 2)
    emb = synth_clustered_embeddings(
        spark, n_vecs, n_clusters
    ).localCheckpoint(eager=True)
    t0 = time.perf_counter()
    edges = knn_graph(emb, k=10, n_probe=2).localCheckpoint(
        eager=True
    )
    n_edges = edges.count()
    knn_wall = round(time.perf_counter() - t0, 2)

    step = max(1, n_vecs // 256)
    sample = emb.filter(F.col("vec_id") % step == 0)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(emb, sample, k=10, method="numpy").collect()
    }
    got = {
        (r.src, r.dst)
        for r in edges.join(
            sample.select(F.col("vec_id").alias("src")), "src", "left_semi"
        ).collect()
    }
    recall = round(len(got & exact) / max(len(exact), 1), 4)

    # seeds: the first 10 members of EVERY cluster (vec_id <
    # 10 * n_clusters covers each residue class exactly 10 times).
    # NOT a modular stride like vec_id % 200 == 0 — that aliases
    # with the vid % n_clusters cluster assignment (gcd(200, 500) =
    # 100 -> seeds land in 5 of 500 clusters) and propagation then
    # correctly saturates only the seeded 1% — measured before this
    # comment existed.
    seeds = emb.filter(F.col("vec_id") < 10 * n_clusters).select(
        "vec_id", (F.col("vec_id") % n_clusters).alias("label")
    )
    t0 = time.perf_counter()
    labeled = label_propagation(edges, seeds, n_rounds=3)
    truth_ok = labeled.filter(F.col("origin") == "propagated").filter(
        F.col("label") == (F.col("vec_id") % n_clusters)
    )
    n_prop = labeled.filter(F.col("origin") == "propagated").count()
    acc = round(truth_ok.count() / max(n_prop, 1), 4)
    lp_wall = round(time.perf_counter() - t0, 2)
    coverage = round(labeled.count() / n_vecs, 4)
    rerun = label_propagation(edges.repartition(97), seeds, n_rounds=3)
    lp_mism = labeled.exceptAll(rerun).count() + rerun.exceptAll(
        labeled
    ).count()
    return {
        "n_vecs": n_vecs,
        "knn_wall_s": knn_wall,
        "knn_edges": n_edges,
        "knn_recall_at_10": recall,
        "lp_wall_s": lp_wall,
        "lp_n_propagated": n_prop,
        "lp_coverage": coverage,
        "lp_accuracy": acc,
        "lp_repartition_mismatches": lp_mism,
    }


def run_uncapped_equivalence(
    spark: SparkSession, n_docs: int, scratch: str
) -> dict:
    """Run the SAME corpus uncapped once (small scale only) and check
    the capped result is identical — on this corpus the hot buckets
    hold only false candidates, so capping must cost zero recall."""
    docs = spark.read.parquet(f"{scratch}/docs_{n_docs}")
    t0 = time.perf_counter()
    uncapped = minhash_near_dup_pairs(
        docs, shingle_n=3, n_bands=8, threshold=0.5, max_bucket_size=None
    )
    n_uncapped = uncapped.count()
    wall = time.perf_counter() - t0
    capped = spark.read.parquet(f"{scratch}/pairs_{n_docs}")
    diff = (
        uncapped.select("doc_a", "doc_b")
        .exceptAll(capped.select("doc_a", "doc_b"))
        .count()
    )
    return {
        "n_docs": n_docs,
        "uncapped_wall_s": round(wall, 2),
        "uncapped_pairs": n_uncapped,
        "capped_pairs": capped.count(),
        "pairs_lost_by_cap": diff,
    }


def run_asof_hot_key(
    spark: SparkSession, n_rows: int, scratch: str
) -> dict:
    """As-of join under extreme key skew: ONE key owns 50% of both
    sides, so the unsalted per-key window sort runs in a single task.
    Measures unsalted vs ``salt_buckets=32`` wall and per-run
    straggler ratio, and checks the outputs are identical — the
    evidence behind asof.py's salting claim."""
    from kafka_sparkstreaming_sbt_spark.operators.asof import asof_join

    def gen(side: str) -> DataFrame:
        df = spark.range(n_rows).withColumnRenamed("id", "rid")
        rid = F.col("rid")
        user = F.when(rid % 2 == 0, F.lit(0)).otherwise(
            F.pmod(F.xxhash64(F.lit(side), rid), F.lit(10_000)) + 1
        )
        # RIGHT timestamps must be UNIQUE per key: two right rows at
        # the same (key, ts) would let the window's last() tie-break
        # differently between the salted and unsalted plans and fake
        # a mismatch.  A full-day stride keeps them unique AND spread
        # over the same day the left side's hash jitter covers (so
        # the salt's time buckets stay balanced); the left side keeps
        # jitter (left ties are independent per row).
        if side == "r":
            off = rid * (86_400_000_000 // n_rows)
        else:
            off = F.pmod(
                F.xxhash64(F.lit("t" + side), rid), F.lit(86_400_000_000)
            )
        ts = F.timestamp_micros(F.lit(1_700_000_000_000_000) + off)
        return df.select(
            rid.alias(f"{side}_id"),
            user.alias("user_id"),
            ts.alias("ts"),
            (F.pmod(F.xxhash64(F.lit("v"), rid), F.lit(1000)) / 100.0).alias(
                "val"
            ),
        )

    lp, rp = f"{scratch}/asof_l", f"{scratch}/asof_r"
    gen("l").repartition(32).write.mode("overwrite").parquet(lp)
    gen("r").drop("r_id").repartition(32).write.mode("overwrite").parquet(rp)
    left, right = spark.read.parquet(lp), spark.read.parquet(rp)

    d = {"n_rows_per_side": n_rows}
    runs = {}
    for label, salt in (("unsalted", None), ("salted", 32)):
        since = _max_stage_id(spark)
        out = asof_join(
            left, right, on="user_id", right_cols=["val"],
            salt_buckets=salt,
        )
        d[f"{label}_wall_s"] = round(timed_noop(out), 2)
        audit = straggler_audit(spark, since)
        d[f"{label}_worst_ratio"] = max(
            (s["ratio"] for s in audit if "ratio" in s), default=None
        )
        runs[label] = out
    mism = (
        runs["unsalted"]
        .select("l_id", "val_asof")
        .exceptAll(runs["salted"].select("l_id", "val_asof"))
        .count()
    )
    d["mismatches"] = mism
    return d


def run_embedding_scale(
    spark: SparkSession, n_vecs: int, scratch: str, audits: list
) -> dict:
    """Embedding-side stress: k-means quantization + SemDeDup + the
    LSH screen on the adversarial vector corpus, all on the BLAS
    (``method="numpy"``) paths — the production configuration.

    LSH bits scale as log2(n/80) so expected bucket size stays
    constant (fixed bits would make the per-bucket quadratic grow as
    N^2); the single-table recall prediction (1 - theta/pi)^bits is
    recomputed per scale and the measured clone recall is gated
    against it — recall decay with bits is exactly why SemDeDup (not
    the LSH screen) is the recall-bearing dedup path."""
    d = {"n_vecs": n_vecs}
    path = f"{scratch}/emb_{n_vecs}"
    synth_embeddings(spark, n_vecs).repartition(32).write.mode(
        "overwrite"
    ).parquet(path)
    emb = spark.read.parquet(path)
    n_clone = n_vecs * CLONE_FRAC_NUM // CLONE_FRAC_DEN
    n_blob = n_vecs * BOILER_FRAC_NUM // BOILER_FRAC_DEN

    since = _max_stage_id(spark)
    t0 = time.perf_counter()
    cents = kmeans_centroids(emb, n_iter=2)
    d["n_cells"] = cents.count()
    d["kmeans_wall_s"] = round(time.perf_counter() - t0, 2)
    audits.append((f"kmeans @ {n_vecs}", straggler_audit(spark, since)))

    # single-probe (the plain SemDeDup approximation) vs multi-probe
    # (n_probe_cells=2, the production recommendation): boundary
    # splits GROW with cell count, so the single-probe collapse
    # fraction DEGRADES at scale (0.86 @ 20K -> 0.70 @ 200K) while
    # multi-probe holds it — that trend is the point of reporting
    # both.  The multi-probe cap is 2x: exploded occupancy counts
    # primary + visiting rows.
    vid = F.col("vec_id")
    d["blob_rows"] = n_blob
    for n_probe, suffix in ((1, "_p1"), (2, "")):
        sd_path = f"{scratch}/semdedup_{n_vecs}_p{n_probe}"
        since = _max_stage_id(spark)
        t0 = time.perf_counter()
        semantic_dedup(
            emb,
            cents,
            threshold=EMB_THRESHOLD,
            max_cell_size=EMB_CELL_CAP * n_probe,
            method="numpy",
            n_probe_cells=n_probe,
        ).write.mode("overwrite").parquet(sd_path)
        d[f"semdedup_wall_s{suffix}"] = round(time.perf_counter() - t0, 2)
        audits.append(
            (
                f"semantic_dedup p{n_probe} @ {n_vecs}",
                straggler_audit(spark, since),
            )
        )
        sd = spark.read.parquet(sd_path)
        per_cluster = (
            sd.filter(vid < n_clone)
            .groupBy((vid / 3).cast("long").alias("grp"))
            .agg(F.sum(F.col("kept").cast("int")).alias("k"))
        )
        row = per_cluster.agg(
            F.count(F.lit(1)).alias("clusters"),
            F.sum(F.when(F.col("k") < 3, 1).otherwise(0)).alias(
                "deduped"
            ),
            F.sum(F.when(F.col("k") == 1, 1).otherwise(0)).alias(
                "collapsed"
            ),
        ).collect()[0]
        d["clone_clusters"] = row["clusters"]
        d[f"clusters_deduped_frac{suffix}"] = round(
            row["deduped"] / max(row["clusters"], 1), 4
        )
        d[f"clusters_collapsed_frac{suffix}"] = round(
            row["collapsed"] / max(row["clusters"], 1), 4
        )
        d[f"blob_kept{suffix}"] = sd.filter(
            (vid >= n_clone) & (vid < n_clone + n_blob) & F.col("kept")
        ).count()
        d[f"unique_false_drops{suffix}"] = sd.filter(
            (vid >= n_clone + n_blob) & ~F.col("kept")
        ).count()
        d[f"max_cell{suffix}"] = (
            sd.groupBy("cell_id")
            .count()
            .agg(F.max("count"))
            .collect()[0][0]
        )

    import math as _m

    n_bits = max(8, _m.ceil(_m.log2(n_vecs / 80)))
    d["lsh_bits"] = n_bits
    cos0 = 1.0 / (1.0 + EMB_CLONE_EPS**2)
    d["lsh_recall_analytic"] = round(
        (1.0 - _m.acos(cos0) / _m.pi) ** n_bits, 4
    )
    lp_path = f"{scratch}/lshpairs_{n_vecs}"
    since = _max_stage_id(spark)
    t0 = time.perf_counter()
    lsh_near_pairs(
        emb,
        EMB_DIM,
        threshold=EMB_THRESHOLD,
        n_bits=n_bits,
        max_bucket_size=EMB_BUCKET_CAP,
        method="numpy",
    ).write.mode("overwrite").parquet(lp_path)
    d["lsh_wall_s"] = round(time.perf_counter() - t0, 2)
    audits.append(
        (f"lsh_near_pairs @ {n_vecs}", straggler_audit(spark, since))
    )
    lp = spark.read.parquet(lp_path)
    expected = (n_clone // 3) * 3 + (1 if n_clone % 3 == 2 else 0)
    found = lp.filter(
        (F.col("id_a") < n_clone)
        & (F.col("id_b") < n_clone)
        & (
            (F.col("id_a") / 3).cast("long")
            == (F.col("id_b") / 3).cast("long")
        )
    ).count()
    d["lsh_clone_pairs_expected"] = expected
    d["lsh_clone_recall"] = round(found / max(expected, 1), 4)
    return d


def run_ivf_search_check(
    spark: SparkSession, n_vecs: int, scratch: str
) -> dict:
    """IVF ANN at the big scale: recall@10 for 8 isotropic queries vs
    the brute-force baseline, with both walls reported (probe_frac
    2/3 on an isotropic corpus trades most of the scan for ~0.9
    recall — the documented worst case; clustered corpora reach the
    same recall at far smaller fractions)."""
    emb = spark.read.parquet(f"{scratch}/emb_{n_vecs}")
    n_clone = n_vecs * CLONE_FRAC_NUM // CLONE_FRAC_DEN
    n_blob = n_vecs * BOILER_FRAC_NUM // BOILER_FRAC_DEN
    qids = [n_clone + n_blob + i * 97 for i in range(8)]
    queries = emb.filter(F.col("vec_id").isin(qids))

    t0 = time.perf_counter()
    brute = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, queries, k=10).collect()
    }
    brute_wall = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_kmeans_topk(emb, queries, k=10, n_iter=2).collect()
    }
    ivf_wall = round(time.perf_counter() - t0, 2)
    return {
        "n_vecs": n_vecs,
        "n_queries": len(qids),
        "brute_wall_s": brute_wall,
        "ivf_wall_s": ivf_wall,
        "recall_at_10": round(len(brute & approx) / max(len(brute), 1), 4),
    }


def synth_clustered_embeddings(
    spark: SparkSession, n_vecs: int, n_clusters: int
) -> DataFrame:
    """CLUSTERED embedding corpus — the shape real embedding models
    produce (documents concentrate around topical modes), and the
    shape where a FRACTIONAL probe budget is pure waste: every
    vector is its cluster's base + 10% noise (intra-cluster cosine
    ~0.99), clusters sized so k-means cells track them 1:1 at the
    default sqrt(N) sizing."""
    df = spark.range(n_vecs).withColumnRenamed("id", "vec_id")
    vid = F.col("vec_id")
    cluster = vid % n_clusters
    dims = F.sequence(F.lit(0), F.lit(EMB_DIM - 1))
    vec = F.transform(
        dims,
        lambda j: (
            _emb_rnd("cc", cluster, j) + 0.1 * _emb_rnd("cn", vid, j)
        ).cast("float"),
    )
    return df.select("vec_id", vec.alias("embedding"))


def _dir_bytes(path: str) -> int:
    total = 0
    for p in Path(path).rglob("*"):
        if p.is_file():
            total += p.stat().st_size
    return total


def run_quantized_search_check(
    spark: SparkSession, n_vecs: int, scratch: str
) -> dict:
    """Compressed-domain search at the big scale: int8 scalar
    quantization and IVF-free PQ+re-rank vs the float brute-force
    baseline — wall, recall@10, and MEASURED on-disk bytes (the 100 TB
    argument is byte economics: the scan stage reads codes, raw
    vectors are touched only for the Q x C re-rank pool).  Parquet
    sizes are measured, not theoretical, so encoding overhead and
    parquet's own compression are priced in."""
    from kafka_sparkstreaming_sbt_spark.operators.quantize import (
        pq_codebooks,
        pq_encode,
        pq_rerank,
        pq_topk,
        quantization_scale,
        quantize_embeddings,
        quantized_topk,
    )

    emb = spark.read.parquet(f"{scratch}/emb_{n_vecs}")
    n_clone = n_vecs * CLONE_FRAC_NUM // CLONE_FRAC_DEN
    n_blob = n_vecs * BOILER_FRAC_NUM // BOILER_FRAC_DEN
    qids = [n_clone + n_blob + i * 97 for i in range(8)]
    queries = emb.filter(F.col("vec_id").isin(qids))
    d = {"n_vecs": n_vecs, "n_queries": len(qids)}
    d["raw_bytes"] = _dir_bytes(f"{scratch}/emb_{n_vecs}")

    t0 = time.perf_counter()
    brute = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, queries, k=10, method="numpy").collect()
    }
    d["brute_wall_s"] = round(time.perf_counter() - t0, 2)

    # int8 tier: encode once (the lake artifact), search in codes
    t0 = time.perf_counter()
    scale = quantization_scale(emb)
    sq_path = f"{scratch}/sq_{n_vecs}"
    quantize_embeddings(emb, scale=scale).write.mode("overwrite").parquet(
        sq_path
    )
    d["sq_encode_wall_s"] = round(time.perf_counter() - t0, 2)
    d["sq_bytes"] = _dir_bytes(sq_path)
    t0 = time.perf_counter()
    sq = {
        (r["query_id"], r["neighbor_id"])
        for r in quantized_topk(
            emb, queries, k=10, method="numpy"
        ).collect()
    }
    d["sq_wall_s"] = round(time.perf_counter() - t0, 2)
    d["sq_recall_at_10"] = round(len(brute & sq) / max(len(brute), 1), 4)

    # PQ tier: train + encode once, ADC candidate pool + exact
    # re-rank of only those (the faiss refine composition).  Pool =
    # 0.1% of the corpus: ADC resolution at M=8 caps how high the
    # true top-10 ranks in coded distance, and the pool is what buys
    # it back — measured at 1M: top-100 0.41, top-500 0.79, top-1000
    # 0.875 recall@10 (M=16 reaches 0.96 at top-100 / 1.0 at top-500
    # for 2x the code bytes — the resolution-vs-bytes dial)
    t0 = time.perf_counter()
    books = pq_codebooks(
        emb, n_subspaces=8, n_codes=256, method="kmeans"
    ).localCheckpoint(eager=True)
    d["pq_train_wall_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    pq_path = f"{scratch}/pq_{n_vecs}"
    # BLAS tier, like every other numpy-path run in this harness —
    # the SQL encode tier is an oracle-determinism surface and its
    # interpreted N x M x K fan-out measured 243 s here vs ~12 s
    pq_encode(emb, books, scale=scale, method="numpy").write.mode(
        "overwrite"
    ).parquet(pq_path)
    d["pq_encode_wall_s"] = round(time.perf_counter() - t0, 2)
    d["pq_bytes"] = _dir_bytes(pq_path)
    enc = spark.read.parquet(pq_path)
    t0 = time.perf_counter()
    pool = max(100, n_vecs // 1000)
    d["pq_pool"] = pool
    cand = pq_topk(enc, queries, books, scale, k=pool, method="numpy")
    pq = {
        (r["query_id"], r["neighbor_id"])
        for r in pq_rerank(cand, emb, queries, k=10).collect()
    }
    d["pq_search_wall_s"] = round(time.perf_counter() - t0, 2)
    d["pq_recall_at_10"] = round(len(brute & pq) / max(len(brute), 1), 4)
    d["sq_compression"] = round(d["raw_bytes"] / max(d["sq_bytes"], 1), 2)
    d["pq_compression"] = round(d["raw_bytes"] / max(d["pq_bytes"], 1), 2)
    return d


def run_ivf_auto_probe_check(
    spark: SparkSession, n_vecs: int, scratch: str
) -> dict:
    """probe_frac="auto" on the clustered corpus (VERDICT r5 #3): the
    measure-then-tune loop must find that neighbors live at home —
    cutting the probed fraction several-fold vs the isotropic-
    calibrated 2/3 default at the SAME recall floor.  Reports the
    tuned probe count, calibration wall (one 64-query brute pass),
    and search wall + recall for both settings."""
    import math as _m

    from kafka_sparkstreaming_sbt_spark.operators.similarity import (
        _auto_n_probe,
        _ivf_search,
    )

    n_clusters = max(2, int(_m.isqrt(n_vecs)))
    path = f"{scratch}/embc_{n_vecs}"
    synth_clustered_embeddings(spark, n_vecs, n_clusters).repartition(
        32
    ).write.mode("overwrite").parquet(path)
    emb = spark.read.parquet(path)
    queries = emb.filter(F.col("vec_id") % 499 == 3)

    t0 = time.perf_counter()
    cents = kmeans_centroids(emb, n_iter=2)
    kmeans_wall = round(time.perf_counter() - t0, 2)
    n_cells = cents.count()
    default_probe = max(4, -(-2 * n_cells // 3))

    t0 = time.perf_counter()
    brute = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(
            emb, queries, k=10, method="numpy"
        ).collect()
    }
    brute_wall = round(time.perf_counter() - t0, 2)

    def probed(n_probe: int) -> tuple[set, float]:
        t = time.perf_counter()
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in _ivf_search(
                emb, queries, cents, 10, n_probe,
                assign_method="numpy", search_method="numpy",
            ).collect()
        }
        return got, round(time.perf_counter() - t, 2)

    # The result sets come from one UNTIMED pass per setting (also
    # the plan-compile/page-cache warm-up); the walls are per-setting
    # MIN over two alternating timed passes.  Single-shot sequential
    # walls on a long-lived session are not comparable: identical
    # fixed-probe work measured 39.07 s in one session and 13.84 s in
    # another (r7 vs r8 runs — ~3x swing from JVM aging + cache
    # state), and sequential order charges the whole drift to
    # whichever setting ran second.  Alternation cancels the drift
    # direction; min discards GC pauses.
    fixed, _ = probed(default_probe)
    t0 = time.perf_counter()
    chosen = _auto_n_probe(
        emb, queries, cents, 10, 0.9, 64, 42, "embedding", "vec_id"
    )
    tune_wall = round(time.perf_counter() - t0, 2)
    auto, _ = probed(chosen)
    fixed_walls, auto_walls = [], []
    for _ in range(2):
        fixed_walls.append(probed(default_probe)[1])
        auto_walls.append(probed(chosen)[1])
    fixed_wall = min(fixed_walls)
    auto_wall = min(auto_walls)
    return {
        "n_vecs": n_vecs,
        "n_clusters": n_clusters,
        "n_cells": n_cells,
        "n_queries": queries.count(),
        "kmeans_wall_s": kmeans_wall,
        "brute_wall_s": brute_wall,
        "default_n_probe": default_probe,
        "fixed_wall_s": fixed_wall,
        "fixed_recall_at_10": round(
            len(brute & fixed) / max(len(brute), 1), 4
        ),
        "auto_n_probe": chosen,
        "tune_wall_s": tune_wall,
        "auto_wall_s": auto_wall,
        "auto_recall_at_10": round(
            len(brute & auto) / max(len(brute), 1), 4
        ),
    }


def run_incremental_semdedup_check(
    spark: SparkSession, n_vecs: int, scratch: str
) -> dict:
    """Incremental SemDeDup at scale: a 1% daily batch against the
    other 99% as corpus.  Three measurements frame the daily-ingest
    economics, plus a parity gate:

    - **full rebuild**: ``semantic_dedup`` over the whole corpus —
      what you'd pay re-running the batch pipeline every day;
    - **incremental (self-contained)**: corpus assignment recomputed
      from vectors — one corpus scan, the documented floor without a
      materialized assignment table;
    - **incremental (materialized cells)**: corpus assignment read
      from parquet (the previous full run's own output) — the true
      daily cost, batch-proportional;
    - **parity**: the batch rows' verdicts from the incremental
      screen must equal the full run's verdicts for those rows
      byte-for-byte (batch ids are allocated above corpus ids, the
      operator's documented parity regime)."""
    emb = spark.read.parquet(f"{scratch}/emb_{n_vecs}")
    n_batch = max(1000, n_vecs // 100)
    split = n_vecs - n_batch
    corpus = emb.filter(F.col("vec_id") < split)
    batch = emb.filter(F.col("vec_id") >= split)

    cents = kmeans_centroids(corpus, n_iter=2)
    cells_path = f"{scratch}/cells_{n_vecs}"

    # each wall is the MIN of 2 runs (the bench.py noise discipline):
    # the materialized-beats-full gate compares walls a few hundred ms
    # apart at this scale, and a single-shot timing flips it on
    # ambient noise (observed: 8.08 vs 7.65 s on a re-run whose prior
    # measurement read 15.72 vs 18.28)
    def _min2(fn) -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return round(best, 2)

    full_wall = _min2(
        lambda: semantic_dedup(
            emb, cents, threshold=EMB_THRESHOLD,
            max_cell_size=EMB_CELL_CAP, method="numpy",
        ).write.mode("overwrite").parquet(f"{scratch}/sd_full_{n_vecs}")
    )

    inc_wall = _min2(
        lambda: incremental_semantic_dedup(
            batch, corpus, cents, threshold=EMB_THRESHOLD,
            max_cell_size=EMB_CELL_CAP, method="numpy",
        ).write.mode("overwrite").parquet(f"{scratch}/sd_inc_{n_vecs}")
    )

    # materialize the corpus assignment exactly as a daily job would:
    # it is the full run's own output restricted to corpus rows
    spark.read.parquet(f"{scratch}/sd_full_{n_vecs}").filter(
        F.col("vec_id") < split
    ).select("vec_id", "cell_id").write.mode("overwrite").parquet(
        cells_path
    )
    inc_mat_wall = _min2(
        lambda: incremental_semantic_dedup(
            batch, corpus, cents, threshold=EMB_THRESHOLD,
            max_cell_size=EMB_CELL_CAP, method="numpy",
            corpus_cells=spark.read.parquet(cells_path),
        ).write.mode("overwrite").parquet(
            f"{scratch}/sd_incmat_{n_vecs}"
        )
    )

    full_batch_rows = spark.read.parquet(
        f"{scratch}/sd_full_{n_vecs}"
    ).filter(F.col("vec_id") >= split)
    mismatch = (
        full_batch_rows.join(
            spark.read.parquet(f"{scratch}/sd_inc_{n_vecs}"),
            ["vec_id", "cell_id", "kept"],
            "full_outer",
        ).count()
        - n_batch
    )
    mismatch_mat = (
        full_batch_rows.join(
            spark.read.parquet(f"{scratch}/sd_incmat_{n_vecs}"),
            ["vec_id", "cell_id", "kept"],
            "full_outer",
        ).count()
        - n_batch
    )
    return {
        "n_vecs": n_vecs,
        "n_batch": n_batch,
        "full_wall_s": full_wall,
        "incremental_wall_s": inc_wall,
        "incremental_materialized_wall_s": inc_mat_wall,
        "parity_mismatches": int(mismatch),
        "parity_mismatches_materialized": int(mismatch_mat),
    }


def run_event_scale(
    spark: SparkSession, n_events: int, scratch: str, audits: list
) -> dict:
    d = {"n_events": n_events}
    path = f"{scratch}/events_{n_events}"
    synth_events(spark, n_events).repartition(32).write.mode(
        "overwrite"
    ).parquet(path)
    events = spark.read.parquet(path)

    since = _max_stage_id(spark)
    salted = salted_sum(
        events, ["user_id"], "value", buckets=32, salt_on="event_id"
    )
    d["salted_wall_s"] = round(timed_noop(salted), 2)
    audits.append(
        (f"salted_sum @ {n_events}", straggler_audit(spark, since))
    )
    plain = events.groupBy("user_id").agg(
        F.sum("value").alias("sum_value")
    )
    d["plain_wall_s"] = round(timed_noop(plain), 2)
    # result invariance: identical keys, totals within float tolerance
    joined = salted.alias("s").join(plain.alias("p"), "user_id", "full")
    bad = joined.filter(
        F.col("s.sum_value").isNull()
        | F.col("p.sum_value").isNull()
        | (
            F.abs(F.col("s.sum_value") - F.col("p.sum_value"))
            > 1e-6 * F.abs(F.col("p.sum_value"))
        )
    ).count()
    d["salt_mismatches"] = bad
    return d


def synth_orders(spark: SparkSession, n_orders: int) -> DataFrame:
    """TPC-H-shaped orders: customers ~ n/10 (so per-customer order
    history grows realistically with scale), dates across 4 years."""
    df = spark.range(n_orders).withColumnRenamed("id", "o_orderkey")
    k = F.col("o_orderkey")
    n_cust = max(1000, n_orders // 10)
    return df.select(
        "o_orderkey",
        F.pmod(F.xxhash64(F.lit("cust"), k), F.lit(n_cust)).alias(
            "o_custkey"
        ),
        F.date_add(
            F.lit("2022-01-01").cast("date"),
            F.pmod(F.xxhash64(F.lit("day"), k), F.lit(1460)).cast("int"),
        ).alias("o_orderdate"),
        (
            F.pmod(F.xxhash64(F.lit("price"), k), F.lit(500_000)) / 100.0
        ).alias("o_totalprice"),
    )


def synth_lineitem(spark: SparkSession, n_orders: int) -> DataFrame:
    """3 lines per order (quantity 1-50 each, so order totals span
    3-150 and a HAVING > 130 cut is genuinely selective)."""
    df = spark.range(n_orders * 3).withColumnRenamed("id", "line_id")
    k = F.col("line_id")
    return df.select(
        (k % n_orders).alias("l_orderkey"),
        (F.pmod(F.xxhash64(F.lit("qty"), k), F.lit(50)) + 1)
        .cast("double")
        .alias("l_quantity"),
        (
            F.pmod(F.xxhash64(F.lit("px"), k), F.lit(90_000)) / 100.0
            + 100.0
        ).alias("l_extendedprice"),
        (F.pmod(F.xxhash64(F.lit("dc"), k), F.lit(11)) / 100.0).alias(
            "l_discount"
        ),
    ).drop("line_id")


def synth_relational_dims(spark: SparkSession, n_cust: int):
    """customer / nation / region with TPC-H shapes."""
    customer = spark.range(n_cust).select(
        F.col("id").alias("c_custkey"),
        F.concat(F.lit("Customer#"), F.col("id")).alias("c_name"),
        F.pmod(F.xxhash64(F.lit("nat"), F.col("id")), F.lit(25)).alias(
            "c_nationkey"
        ),
    )
    nation = spark.range(25).select(
        F.col("id").alias("n_nationkey"),
        F.concat(F.lit("NATION_"), F.col("id")).alias("n_name"),
        (F.col("id") % 5).alias("n_regionkey"),
    )
    region = spark.createDataFrame(
        [
            (0, "AFRICA"),
            (1, "AMERICA"),
            (2, "ASIA"),
            (3, "EUROPE"),
            (4, "MIDDLE EAST"),
        ],
        "r_regionkey long, r_name string",
    )
    return customer, nation, region


def run_relational_scale(
    spark: SparkSession, n_orders: int, scratch: str, audits: list
) -> dict:
    """VERDICT r6 #5: the join/window/rollup family under 10x scale —
    SCALECHECK stressed documents/embeddings/events but analytics.py
    had only ever run at sf0.1.  Times the four representative plan
    shapes (broadcast-dim fact join + agg, per-key RANGE window,
    agg-then-join-back HAVING, double partial->final cohort agg) with
    the same near-linearity + straggler gates as every other
    section."""
    from kafka_sparkstreaming_sbt_spark.operators.analytics import (
        cohort_retention,
        large_orders,
        revenue_by_nation,
        rolling_customer_spend,
    )

    d = {"n_orders": n_orders}
    n_cust = max(1000, n_orders // 10)
    opath = f"{scratch}/orders_{n_orders}"
    lpath = f"{scratch}/lineitem_{n_orders}"
    cpath = f"{scratch}/customer_{n_orders}"
    synth_orders(spark, n_orders).repartition(32).write.mode(
        "overwrite"
    ).parquet(opath)
    synth_lineitem(spark, n_orders).repartition(32).write.mode(
        "overwrite"
    ).parquet(lpath)
    synth_relational_dims(spark, n_cust)[0].repartition(4).write.mode(
        "overwrite"
    ).parquet(cpath)
    orders = spark.read.parquet(opath)
    lineitem = spark.read.parquet(lpath)
    customer = spark.read.parquet(cpath)
    _, nation, region = synth_relational_dims(spark, n_cust)

    since = _max_stage_id(spark)
    rev = revenue_by_nation(lineitem, orders, customer, nation, region)
    d["revenue_wall_s"] = round(timed_noop_min2(rev), 2)
    # one region = 5 nations; every nation must appear at this scale
    d["revenue_rows"] = rev.count()
    audits.append(
        (f"revenue_by_nation @ {n_orders}", straggler_audit(spark, since))
    )

    since = _max_stage_id(spark)
    roll = rolling_customer_spend(orders, days=90)
    d["rolling_wall_s"] = round(timed_noop_min2(roll), 2)
    d["rolling_rows_ok"] = roll.count() == n_orders  # window: 1:1 rows
    audits.append(
        (
            f"rolling_customer_spend @ {n_orders}",
            straggler_audit(spark, since),
        )
    )

    since = _max_stage_id(spark)
    lo = large_orders(orders, customer, lineitem, min_qty=130.0)
    d["large_orders_wall_s"] = round(timed_noop_min2(lo), 2)
    n_large = lo.count()
    d["large_orders_rows"] = n_large
    # the HAVING must be selective but non-degenerate: 3 draws from
    # 1..50 exceed 130 a few % of the time at any scale
    d["large_orders_selective"] = 0 < n_large < n_orders // 2
    audits.append(
        (f"large_orders @ {n_orders}", straggler_audit(spark, since))
    )

    since = _max_stage_id(spark)
    coh = cohort_retention(orders)
    d["cohort_wall_s"] = round(timed_noop_min2(coh), 2)
    bad = coh.filter(
        (F.col("retention_rate") > 1.0) | (F.col("retention_rate") <= 0.0)
    ).count()
    d["cohort_rate_violations"] = bad
    audits.append(
        (f"cohort_retention @ {n_orders}", straggler_audit(spark, since))
    )
    return d


# ---------------------------------------------------------------- report


def scaling_row(name: str, small: float, big: float, factor: int) -> dict:
    ratio = big / max(small, 1e-9)
    limit = factor * LINEAR_HEADROOM
    return {
        "pipeline": name,
        "wall_small_s": small,
        "wall_big_s": big,
        "ratio": round(ratio, 2),
        "limit": limit,
        "factor": factor,
        "ok": ratio <= limit,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--doc-scales", default="50000,500000")
    ap.add_argument("--event-scales", default="1000000,10000000")
    ap.add_argument("--embed-scales", default="20000,200000")
    ap.add_argument("--asof-rows", type=int, default=3_000_000)
    ap.add_argument("--relational-scales", default="1000000,10000000")
    ap.add_argument("--wet-scales", default="100000,1000000")
    ap.add_argument("--out", default=str(REPO / "SCALECHECK.md"))
    ap.add_argument("--skip-uncapped", action="store_true")
    # production-depth BPE rounds (VERDICT r9 #3); 0 skips the runner
    ap.add_argument("--bpe-depth", type=int, default=16_384)
    args = ap.parse_args()
    doc_scales = [int(x) for x in args.doc_scales.split(",")]
    event_scales = [int(x) for x in args.event_scales.split(",")]
    relational_scales = (
        [int(x) for x in args.relational_scales.split(",")]
        if args.relational_scales
        else []
    )
    embed_scales = (
        [int(x) for x in args.embed_scales.split(",")]
        if args.embed_scales
        else []
    )
    wet_scales = (
        [int(x) for x in args.wet_scales.split(",")]
        if args.wet_scales
        else []
    )

    scratch = tempfile.mkdtemp(prefix="scalecheck_")
    spark = get_spark(
        "scalecheck", extra_conf={"spark.ui.enabled": "true"}
    )
    audits: list = []
    try:
        t_total = time.perf_counter()
        doc_results = [
            run_doc_scale(spark, n, scratch, audits) for n in doc_scales
        ]
        span_results = [
            run_span_dedup_scale(spark, n, scratch, audits)
            for n in doc_scales
        ]
        bpe_results = [
            run_bpe_scale(spark, n, scratch, audits)
            for n in doc_scales
        ]
        # rounds-axis depth point on the SMALL corpus (the claim
        # under test is per-merge cost vs depth, not corpus size)
        bpe_depth = (
            run_bpe_depth(
                spark, doc_scales[0], scratch,
                bpe_results[0]["_local_table"], args.bpe_depth,
            )
            if args.bpe_depth
            else None
        )
        for d in bpe_results:
            d.pop("_local_table", None)
        uncapped = (
            None
            if args.skip_uncapped
            else run_uncapped_equivalence(spark, doc_scales[0], scratch)
        )
        sel_results = [
            run_selection_scale(spark, n, scratch) for n in doc_scales
        ]
        budget_results = [
            run_budget_scale(spark, n) for n in doc_scales
        ]
        graph_result = (
            run_graph_scale(spark, embed_scales[-1])
            if embed_scales
            else None
        )
        wet_results = [
            run_wet_scale(spark, n, scratch) for n in wet_scales
        ]
        bloom_results = [
            run_bloom_scale(spark, n, scratch) for n in doc_scales
        ]
        bloom_result = bloom_results[-1]
        emb_results = [
            run_embedding_scale(spark, n, scratch, audits)
            for n in embed_scales
        ]
        ivf_result = (
            run_ivf_search_check(spark, embed_scales[-1], scratch)
            if emb_results
            else None
        )
        auto_probe_result = (
            run_ivf_auto_probe_check(spark, embed_scales[-1], scratch)
            if emb_results
            else None
        )
        quant_result = (
            run_quantized_search_check(spark, embed_scales[-1], scratch)
            if emb_results
            else None
        )
        inc_sem_result = (
            run_incremental_semdedup_check(
                spark, embed_scales[-1], scratch
            )
            if emb_results
            else None
        )
        event_results = [
            run_event_scale(spark, n, scratch, audits)
            for n in event_scales
        ]
        rel_results = [
            run_relational_scale(spark, n, scratch, audits)
            for n in relational_scales
        ]
        asof_result = (
            run_asof_hot_key(spark, args.asof_rows, scratch)
            if args.asof_rows
            else None
        )
        total_wall = round(time.perf_counter() - t_total, 1)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)

    doc_factor = doc_scales[-1] // doc_scales[0]
    ev_factor = event_scales[-1] // event_scales[0]
    small, big = doc_results[0], doc_results[-1]
    ev_small, ev_big = event_results[0], event_results[-1]
    scaling = [
        scaling_row(
            "minhash_near_dup (capped)",
            small["pairs_wall_s"],
            big["pairs_wall_s"],
            doc_factor,
        ),
        scaling_row(
            "CC + select_canonical",
            small["canonical_wall_s"],
            big["canonical_wall_s"],
            doc_factor,
        ),
        scaling_row(
            "salted_sum",
            ev_small["salted_wall_s"],
            ev_big["salted_wall_s"],
            ev_factor,
        ),
        scaling_row(
            "remove_duplicate_spans (window-hash)",
            span_results[0]["wall_s"],
            span_results[-1]["wall_s"],
            doc_factor,
        ),
        scaling_row(
            "bpe_train_merges (8 rounds)",
            bpe_results[0]["wall_s"],
            bpe_results[-1]["wall_s"],
            doc_factor,
        ),
        scaling_row(
            "bpe_train_merges_local (1000 rounds)",
            bpe_results[0]["local_wall_s"],
            bpe_results[-1]["local_wall_s"],
            doc_factor,
        ),
    ]
    if sel_results:
        s_small, s_big = sel_results[0], sel_results[-1]
        scaling += [
            scaling_row(
                "dsir_select",
                s_small["dsir_wall_s"],
                s_big["dsir_wall_s"],
                doc_factor,
            ),
            scaling_row(
                "nb_train + nb_score",
                s_small["nb_wall_s"],
                s_big["nb_wall_s"],
                doc_factor,
            ),
        ]
    if budget_results:
        scaling.append(
            scaling_row(
                "select_to_token_budget",
                budget_results[0]["budget_wall_s"],
                budget_results[-1]["budget_wall_s"],
                doc_factor,
            )
        )
    if wet_results:
        w_small, w_big = wet_results[0], wet_results[-1]
        wet_factor = w_big["n_pages"] // w_small["n_pages"]
        scaling.append(
            scaling_row(
                "read_wet (gzip parse)",
                w_small["parse_wall_s"],
                w_big["parse_wall_s"],
                wet_factor,
            )
        )
    if rel_results:
        r_small, r_big = rel_results[0], rel_results[-1]
        rel_factor = relational_scales[-1] // relational_scales[0]
        scaling += [
            scaling_row(
                "revenue_by_nation (Q5 shape)",
                r_small["revenue_wall_s"],
                r_big["revenue_wall_s"],
                rel_factor,
            ),
            scaling_row(
                "rolling_customer_spend (RANGE window)",
                r_small["rolling_wall_s"],
                r_big["rolling_wall_s"],
                rel_factor,
            ),
            scaling_row(
                "large_orders (Q18 HAVING)",
                r_small["large_orders_wall_s"],
                r_big["large_orders_wall_s"],
                rel_factor,
            ),
            scaling_row(
                "cohort_retention (double agg)",
                r_small["cohort_wall_s"],
                r_big["cohort_wall_s"],
                rel_factor,
            ),
        ]
    if emb_results:
        em_small, em_big = emb_results[0], emb_results[-1]
        emb_factor = embed_scales[-1] // embed_scales[0]
        scaling += [
            scaling_row(
                "kmeans_centroids (BLAS assign)",
                em_small["kmeans_wall_s"],
                em_big["kmeans_wall_s"],
                emb_factor,
            ),
            scaling_row(
                "semantic_dedup (numpy)",
                em_small["semdedup_wall_s"],
                em_big["semdedup_wall_s"],
                emb_factor,
            ),
            scaling_row(
                "lsh_near_pairs (numpy, bits~log2 N)",
                em_small["lsh_wall_s"],
                em_big["lsh_wall_s"],
                emb_factor,
            ),
        ]

    checks = [
        *[
            (
                f"near-linear: {s['pipeline']} {s['ratio']}x at "
                f"{s['factor']}x data (limit {s['limit']}x)",
                s["ok"],
            )
            for s in scaling
        ],
        *[
            (
                f"clone recall @ {d['n_docs']}: {d['clone_recall']}",
                d["clone_recall"] >= 0.95,
            )
            for d in doc_results
        ],
        *[
            (
                f"no false-positive pairs @ {d['n_docs']} "
                f"({d['non_clone_pairs']})",
                d["non_clone_pairs"] == 0,
            )
            for d in doc_results
        ],
        *[
            (
                f"span dedup output exact in all 4 doc classes @ "
                f"{d['n_docs']:,}: {d['mismatches']} mismatches",
                d["mismatches"] == 0,
            )
            for d in span_results
        ],
        *[
            (
                f"BPE training deterministic under repartitioning + "
                f"argmax monotone @ {d['n_docs']:,} "
                f"({d['n_merges']} merges)",
                d["deterministic"] == 1
                and d["monotone"] == 1
                and d["n_merges"] == 8,
            )
            for d in bpe_results
        ],
        *[
            (
                f"local BPE trainer: 1000 merges @ {d['n_docs']:,} "
                f"in {d['local_wall_s']}s, distributed-prefix exact",
                d["local_n_merges"] == 1000
                and d["local_prefix_equal"] == 1,
            )
            for d in bpe_results
        ],
        *(
            [
                (
                    f"deep BPE: {bpe_depth['n_merges']:,} merges @ "
                    f"{bpe_depth['n_docs']:,} in {bpe_depth['wall_s']}s "
                    f"(<= rounds-linear bound "
                    # bound scales off the baseline run's ACTUAL merge
                    # count, not a literal 1000 (ADVICE r10 #4: a
                    # short-trained baseline would silently skew it)
                    f"{round(bpe_depth['n_merges'] / max(bpe_results[0]['local_n_merges'], 1) * bpe_results[0]['local_wall_s'], 1)}s), "
                    "1000-prefix exact, argmax monotone",
                    bpe_depth["n_merges"]
                    == bpe_depth["n_merges_requested"]
                    and bpe_depth["prefix_1000_equal"] == 1
                    and bpe_depth["monotone"] == 1
                    and bpe_depth["wall_s"]
                    <= bpe_depth["n_merges"]
                    / max(bpe_results[0]["local_n_merges"], 1)
                    * bpe_results[0]["local_wall_s"],
                ),
                (
                    f"deep BPE encode: {bpe_depth['n_merges']:,}-merge "
                    f"local application in "
                    f"{bpe_depth['encode_wall_s']}s, "
                    f"{bpe_depth['encode_mismatches']} words fail to "
                    "reconstruct",
                    bpe_depth["encode_mismatches"] == 0,
                ),
            ]
            if bpe_depth is not None
            else []
        ),
        (
            "salt invariance: 0 mismatching totals",
            all(e["salt_mismatches"] == 0 for e in event_results),
        ),
        *[
            (
                f"DSIR selection on-domain @ {s['n_docs']}: "
                f"{s['dsir_on_domain_frac']} of {s['dsir_n_selected']}",
                s["dsir_on_domain_frac"] >= 0.95,
            )
            for s in sel_results
        ],
        *[
            (
                f"NB quality-filter accuracy @ {s['n_docs']}: "
                f"{s['nb_accuracy']}",
                s["nb_accuracy"] >= 0.999,
            )
            for s in sel_results
        ],
        *[
            (
                f"WET parse complete @ {w['n_pages']:,}: "
                f"{w['parsed']:,} parsed, {w['dead_letters']} dead",
                w["parsed"] == w["n_pages"]
                and w["dead_letters"] == 0,
            )
            for w in wet_results
        ],
        *[
            (
                f"bloom screen verdicts == plain anti-join @ "
                f"{br['n_docs']:,} corpus x 3 batches",
                bool(br["parity_ok"]),
            )
            for br in bloom_results
        ],
        (
            f"bloom fp rate {bloom_result['fp_rate']} within 3x the "
            f"1% target",
            bloom_result["fp_rate"] <= 0.03,
        ),
        *[
            (
                f"bloom fill {br['fill_fraction']} matches theory "
                f"{br['fill_expected']} @ {br['n_docs']:,} "
                f"(probe {br['fill_probe_wall_s']}s)",
                bool(br["fill_matches_theory"]),
            )
            for br in bloom_results
        ],
        *[
            (
                f"bloom confirm join touches only the positive slice "
                f"@ {br['n_docs']:,}: worst batch "
                f"{br['confirm_rows_worst']:,} rows <= budget "
                f"{br['confirm_rows_budget']:,} (dups + 3x fpp of "
                f"new) of {br['n_batch']:,}-doc batches",
                br["confirm_rows_worst"] <= br["confirm_rows_budget"],
            )
            for br in bloom_results
        ],
        (
            f"bloom confirm artifact is FIXED-size per doc — "
            f"{bloom_result['hash_bytes'] / bloom_result['n_docs']:.1f} "
            f"B/doc on disk (bound 40; corpus text here is "
            f"{bloom_result['corpus_bytes'] / bloom_result['n_docs']:.0f} "
            f"B/doc on this deliberately short-doc corpus — the "
            f"ratio shrinks with real ~KB/doc documents)",
            bloom_result["hash_bytes"]
            <= 40 * bloom_result["n_docs"],
        ),
        (
            f"bloom per-batch wall grows no faster than the text "
            f"anti-join across "
            f"{bloom_results[-1]['n_docs'] // bloom_results[0]['n_docs']}x "
            f"corpus (screen best-of-3 "
            f"{bloom_results[0]['screen_wall_min_s']}s -> "
            f"{bloom_results[-1]['screen_wall_min_s']}s vs baseline "
            f"{bloom_results[0]['antijoin_wall_min_s']}s -> "
            f"{bloom_results[-1]['antijoin_wall_min_s']}s; 1.2x "
            f"noise allowance)",
            bloom_results[-1]["screen_wall_min_s"]
            * max(bloom_results[0]["antijoin_wall_min_s"], 0.05)
            <= 1.2
            * bloom_results[-1]["antijoin_wall_min_s"]
            * max(bloom_results[0]["screen_wall_min_s"], 0.05),
        ),
    ]
    for r in rel_results:
        n = r["n_orders"]
        checks += [
            (
                f"revenue_by_nation covers all 5 region nations @ {n:,} "
                f"({r['revenue_rows']} rows)",
                r["revenue_rows"] == 5,
            ),
            (
                f"rolling window emits exactly 1 row per order @ {n:,}",
                bool(r["rolling_rows_ok"]),
            ),
            (
                f"large_orders HAVING is selective @ {n:,} "
                f"({r['large_orders_rows']:,} rows)",
                bool(r["large_orders_selective"]),
            ),
            (
                f"cohort retention_rate in (0,1] @ {n:,} "
                f"({r['cohort_rate_violations']} violations)",
                r["cohort_rate_violations"] == 0,
            ),
        ]
    if uncapped is not None:
        checks.append(
            (
                f"cap loses no true pair (uncapped diff = "
                f"{uncapped['pairs_lost_by_cap']})",
                uncapped["pairs_lost_by_cap"] == 0,
            )
        )
    for e in emb_results:
        n = e["n_vecs"]
        checks += [
            (
                f"SemDeDup (2-probe) dedups clone clusters @ {n}: "
                f"{e['clusters_deduped_frac']} "
                f"(1-probe: {e['clusters_deduped_frac_p1']})",
                e["clusters_deduped_frac"] >= 0.99,
            ),
            (
                f"SemDeDup (2-probe) collapses clusters to one @ {n}: "
                f"{e['clusters_collapsed_frac']} "
                f"(1-probe: {e['clusters_collapsed_frac_p1']})",
                e["clusters_collapsed_frac"] >= 0.90,
            ),
            (
                f"multi-probe recovers boundary splits @ {n}: "
                f"{e['clusters_collapsed_frac']} >= "
                f"{e['clusters_collapsed_frac_p1']}",
                e["clusters_collapsed_frac"]
                >= e["clusters_collapsed_frac_p1"],
            ),
            (
                f"SemDeDup kills the blob @ {n}: {e['blob_kept']} of "
                f"{e['blob_rows']} kept",
                e["blob_kept"] <= max(1, e["blob_rows"] // 100),
            ),
            (
                f"no unique vectors dropped @ {n} "
                f"({e['unique_false_drops']} 2-probe, "
                f"{e['unique_false_drops_p1']} 1-probe)",
                e["unique_false_drops"] == 0
                and e["unique_false_drops_p1"] == 0,
            ),
            (
                f"LSH clone recall @ {n} matches single-table theory: "
                f"{e['lsh_clone_recall']} vs {e['lsh_recall_analytic']} "
                f"({e['lsh_bits']} bits)",
                abs(e["lsh_clone_recall"] - e["lsh_recall_analytic"])
                <= 0.15,
            ),
        ]
    if ivf_result is not None:
        checks.append(
            (
                f"IVF recall@10 at {ivf_result['n_vecs']:,} vectors: "
                f"{ivf_result['recall_at_10']}",
                ivf_result["recall_at_10"] >= 0.85,
            )
        )
    if quant_result is not None:
        qd = quant_result
        checks += [
            (
                f"int8 search recall@10 at {qd['n_vecs']:,}: "
                f"{qd['sq_recall_at_10']}",
                qd["sq_recall_at_10"] >= 0.9,
            ),
            (
                f"PQ ADC top-{qd['pq_pool']} + exact re-rank recall@10 at "
                f"{qd['n_vecs']:,}: {qd['pq_recall_at_10']}",
                qd["pq_recall_at_10"] >= 0.8,
            ),
            (
                f"measured parquet compression: int8 "
                f"{qd['sq_compression']}x, PQ {qd['pq_compression']}x "
                "of raw",
                qd["sq_compression"] >= 1.5
                and qd["pq_compression"] >= 5.0,
            ),
        ]
    if auto_probe_result is not None:
        a = auto_probe_result
        checks += [
            (
                f"auto probe tunes below the 2/3 default on clustered "
                f"data: {a['auto_n_probe']} < {a['default_n_probe']} "
                f"of {a['n_cells']} cells",
                a["auto_n_probe"] < a["default_n_probe"],
            ),
            (
                f"auto-tuned recall@10 holds the floor: "
                f"{a['auto_recall_at_10']} >= 0.9",
                a["auto_recall_at_10"] >= 0.9,
            ),
            (
                f"auto search faster than fixed: {a['auto_wall_s']}s "
                f"(+{a['tune_wall_s']}s tune) vs {a['fixed_wall_s']}s",
                a["auto_wall_s"] < a["fixed_wall_s"],
            ),
        ]
    if inc_sem_result is not None:
        i = inc_sem_result
        checks += [
            (
                f"incremental SemDeDup parity with the full run "
                f"({i['n_batch']:,}-row batch vs {i['n_vecs']:,}): "
                f"{i['parity_mismatches']} / "
                f"{i['parity_mismatches_materialized']} mismatches",
                i["parity_mismatches"] == 0
                and i["parity_mismatches_materialized"] == 0,
            ),
            (
                f"materialized-cells daily cost beats the full "
                f"rebuild: {i['incremental_materialized_wall_s']}s vs "
                f"{i['full_wall_s']}s (self-contained: "
                f"{i['incremental_wall_s']}s)",
                i["incremental_materialized_wall_s"]
                < i["full_wall_s"],
            ),
        ]
    if asof_result is not None:
        checks.append(
            (
                "asof salting: salted == unsalted "
                f"({asof_result['mismatches']} mismatches)",
                asof_result["mismatches"] == 0,
            )
        )
        sr = asof_result.get("salted_worst_ratio")
        checks.append(
            (
                f"asof salting kills the hot-key straggler (salted "
                f"worst max/median {sr}x vs unsalted "
                f"{asof_result.get('unsalted_worst_ratio')}x)",
                sr is not None and sr <= STRAGGLER_RATIO,
            )
        )
    for b in budget_results:
        checks.append(
            (
                f"token-budget fill == global-window reference @ "
                f"{b['n_docs']:,} rows ({b['budget_parity_mismatches']}"
                f" mismatches, {b['budget_n_selected']:,} selected)",
                b["budget_parity_mismatches"] == 0,
            )
        )
    if graph_result is not None:
        g = graph_result
        checks += [
            (
                f"blocked kNN graph recall@10 {g['knn_recall_at_10']} "
                f"at {g['n_vecs']:,} clustered vectors "
                f"({g['knn_edges']:,} edges, floor 0.9)",
                g["knn_recall_at_10"] >= 0.9,
            ),
            (
                f"label propagation accuracy {g['lp_accuracy']} on "
                f"{g['lp_n_propagated']:,} propagated nodes "
                f"(floor 0.99)",
                g["lp_accuracy"] >= 0.99,
            ),
            (
                f"label propagation coverage {g['lp_coverage']} of "
                f"{g['n_vecs']:,} nodes after 3 rounds from 1% "
                f"seeds (floor 0.9)",
                g["lp_coverage"] >= 0.9,
            ),
            (
                f"label propagation bit-identical under "
                f"repartitioning ({g['lp_repartition_mismatches']} "
                f"mismatches)",
                g["lp_repartition_mismatches"] == 0,
            ),
        ]
    straggler_rows = []
    for label, stages in audits:
        for s in stages:
            if "error" in s:
                straggler_rows.append((label, s, None))
            else:
                straggler_rows.append(
                    (label, s, s["ratio"] <= STRAGGLER_RATIO)
                )
    audited = [ok for _, _, ok in straggler_rows if ok is not None]
    checks.append(
        (
            f"no straggler task >{STRAGGLER_RATIO:.0f}x median in "
            f"{len(audited)} audited heavy stages",
            bool(audited) and all(audited),
        )
    )

    ok_all = all(ok for _, ok in checks)
    lines = [
        "# SCALECHECK — adversarial scale-stress (VERDICT r4 #1)",
        "",
        f"Generated by `scripts/scalecheck.py` on local[32]; total "
        f"harness wall {total_wall}s.  Corpus: deterministic "
        f"adversarial documents (25% true-clone clusters of 3 at "
        f"J~0.65, 20% boilerplate sharing a {HEADER_TOKENS}-token "
        f"header at J~0.24, 55% unique) and events with one key "
        f"holding 30% of rows.  Scales: {doc_scales[0]:,} -> "
        f"{doc_scales[-1]:,} docs ({doc_scales[0]//5000}x / "
        f"{doc_scales[-1]//5000}x sf0.1), {event_scales[0]:,} -> "
        f"{event_scales[-1]:,} events"
        + (
            f", and {embed_scales[0]:,} -> {embed_scales[-1]:,} "
            f"adversarial embeddings ({embed_scales[0]//2000}x / "
            f"{embed_scales[-1]//2000}x sf0.1)."
            if embed_scales
            else "."
        ),
        "",
        f"**Overall: {'PASS' if ok_all else 'FAIL'}**",
        "",
        "## Assertions",
        "",
        "| check | result |",
        "| --- | --- |",
        *[
            f"| {name} | {'PASS' if ok else 'FAIL'} |"
            for name, ok in checks
        ],
        "",
        "## Wall-time scaling",
        "",
        "| pipeline | wall @ small (s) | wall @ big (s) | measured "
        "ratio | linear x headroom limit |",
        "| --- | --- | --- | --- | --- |",
        *[
            f"| {s['pipeline']} | {s['wall_small_s']} | "
            f"{s['wall_big_s']} | {s['ratio']}x | {s['limit']}x |"
            for s in scaling
        ],
        "",
        "## Hot-bucket adversary",
        "",
        "Uncapped LSH candidate counts are computed from bucket sizes"
        " (sum n*(n-1)/2) — the quadratic join is never executed:",
        "",
        "| n_docs | max bucket | uncapped candidates | in hot (>50) "
        "buckets | pairs found | clone recall |",
        "| --- | --- | --- | --- | --- | --- |",
        *[
            f"| {d['n_docs']:,} | {d['profile']['max_bucket']:,} | "
            f"{d['profile']['uncapped_candidates']:,} | "
            f"{d['profile']['candidates_in_hot_buckets']:,} | "
            f"{d['n_pairs']:,} | {d['clone_recall']} |"
            for d in doc_results
        ],
    ]
    lines += [
        "",
        "## Duplicated-span excision (ExactSubstr shape)",
        "",
        "`remove_duplicate_spans` (W=16) over the same corpus; the "
        "layout makes correct output PROVABLE per doc class "
        "(boilerplate loses exactly its 20-token header, clone "
        "variants 0/1 lose exactly tokens 8..29, variant 2 and "
        "unique docs come through whole — the precision leg), so the "
        "gate is an exact mismatch count over every document:",
        "",
        "| n_docs | wall (s) | tokens removed | boiler collision "
        "docs | mismatches |",
        "| --- | --- | --- | --- | --- |",
        *[
            f"| {d['n_docs']:,} | {d['wall_s']} | "
            f"{d['tokens_removed_total']:,} | "
            f"{d['boiler_collision_docs']:,} | {d['mismatches']} |"
            for d in span_results
        ],
        "",
        "`boiler collision docs` counts boilerplate docs whose span "
        "ate 1-3 leading body tokens beyond the header: a "
        "header-straddling window genuinely matches between two "
        "boiler docs whose first body token collides in the 1M-token "
        "vocabulary (expected ~ n_boiler^2 x 1e-6 docs; excising it "
        "is correct), so the gate pins the clean text to the exact "
        "corresponding body suffix instead of a fixed 20-token cut.",
        "",
        "## BPE merge training",
        "",
        "`bpe_train_merges` (8 rounds) over the same corpus — word "
        "TYPES approach 10^6 at the big scale, so the "
        "vocabulary-sized rounds run on a genuinely large table.  "
        "Gated on bit-identical retraining under a repartition(7) of "
        "the input and on pair_count non-increasing in merge rank:",
        "",
        "| n_docs | wall (s) | merges | deterministic | monotone | "
        "top pair count |",
        "| --- | --- | --- | --- | --- | --- |",
        *[
            f"| {d['n_docs']:,} | {d['wall_s']} | {d['n_merges']} | "
            f"{d['deterministic']} | {d['monotone']} | "
            f"{d['top_pair_count']:,} |"
            for d in bpe_results
        ],
        "",
        "Production depth (`bpe_train_merges_local` — the merge loop "
        "over the COLLECTED word-type table, a documented bounded "
        "artifact like the PQ codebooks; the one corpus-sized "
        "shuffle stays distributed): 1,000 merges per scale, first "
        "8 gated exactly equal to the distributed trainer's table.  "
        "Wall is dominated by the vocabulary collect + incremental "
        "pair updates, NOT by rounds x corpus — the regime where "
        "the two-jobs-per-round loop would pay ~2,000 sequential "
        "driver round-trips:",
        "",
        "| n_docs | local wall (s) | merges | prefix == distributed |",
        "| --- | --- | --- | --- |",
        *[
            f"| {d['n_docs']:,} | {d['local_wall_s']} | "
            f"{d['local_n_merges']} | {d['local_prefix_equal']} |"
            for d in bpe_results
        ],
    ]
    if bpe_depth is not None:
        per_merge_1k = bpe_results[0]["local_wall_s"] / max(
            bpe_results[0]["local_n_merges"], 1
        )
        per_merge_deep = bpe_depth["wall_s"] / max(
            bpe_depth["n_merges"], 1
        )
        lines += [
            "",
            f"Rounds-axis depth point (VERDICT r9 #3): "
            f"**{bpe_depth['n_merges']:,} merges** at "
            f"{bpe_depth['n_docs']:,} docs in "
            f"**{bpe_depth['wall_s']} s** — average "
            f"{round(per_merge_deep * 1000, 1)} ms/merge vs "
            f"{round(per_merge_1k * 1000, 1)} ms/merge for the "
            "1,000-merge run (the average FALLS with depth: the "
            "vocabulary collect amortizes and deeper, rarer pairs "
            "touch fewer word types — no lazy-heap or rank-scan "
            "degradation).  First 1,000 merges bit-equal to the "
            "independent 1,000-merge table; full-depth encode "
            f"(`bpe_vocab_tokens(method='local')`) in "
            f"{bpe_depth['encode_wall_s']} s with "
            f"{bpe_depth['encode_mismatches']} reconstruction "
            "mismatches.",
        ]
    if uncapped is not None:
        lines += [
            "",
            f"Uncapped-vs-capped equivalence at {uncapped['n_docs']:,} "
            f"docs: uncapped run walked {uncapped['uncapped_pairs']:,} "
            f"verified pairs in {uncapped['uncapped_wall_s']}s vs the "
            f"capped run's {uncapped['capped_pairs']:,}; pairs lost to "
            f"the cap: **{uncapped['pairs_lost_by_cap']}** (hot "
            "buckets on this corpus hold only false candidates, so "
            "capping costs zero recall while deleting the quadratic).",
        ]
    if sel_results:
        lines += [
            "",
            "## Data-selection scale-stress (DSIR / NB quality filter)",
            "",
            "The boilerplate slice's shared 20-token header is a "
            "synthetic 'domain': a 5% seed of it is the DSIR target, "
            "and the gate asks the Gumbel-top-k to fill with the "
            "REMAINING boilerplate docs; the NB filter trains on "
            "boilerplate-ness labels.  Both are one explode + "
            "broadcast-bounded joins — the wall rows feed the "
            "near-linearity table above.",
            "",
            "| n_docs | dsir wall (s) | on-domain frac | nb wall (s) "
            "| nb accuracy |",
            "| --- | --- | --- | --- | --- |",
            *[
                f"| {s['n_docs']:,} | {s['dsir_wall_s']} | "
                f"{s['dsir_on_domain_frac']} | {s['nb_wall_s']} | "
                f"{s['nb_accuracy']} |"
                for s in sel_results
            ],
        ]
    if wet_results:
        lines += [
            "",
            "## WET ingest scale-stress (Common Crawl layout)",
            "",
            "Per-record-gzip WET segments (32 files), generated "
            "distributed, parsed via binaryFile + the pure-Python "
            "record parser (file = parallelism unit):",
            "",
            "| n_pages | gzip MiB | parse wall (s) | pages/s | MiB/s |",
            "| --- | --- | --- | --- | --- |",
            *[
                f"| {w['n_pages']:,} | {w['gzip_mb']} | "
                f"{w['parse_wall_s']} | {w['pages_per_sec']:,.0f} | "
                f"{w['mb_per_sec']} |"
                for w in wet_results
            ],
        ]
    lines += [
        "",
        "## Bloom exact-screen economics",
        "",
        "Fixed "
        f"{bloom_results[0]['n_batch']:,}-doc ingest batches (50% "
        "exact re-crawls) screened against each corpus scale — the "
        "operator's claim is that per-batch cost tracks the 33-byte/"
        "doc hash artifact instead of the corpus text, and the table "
        "measures exactly that:",
        "",
        "| corpus | bitmap MB | build s | hash-table s | screen/batch "
        "best-of-3 s | anti-join/batch best-of-3 s | fp rate | "
        "confirm slice (worst) |",
        "| --- | --- | --- | --- | --- | --- | --- | --- |",
        *[
            f"| {br['n_docs']:,} | {br['bloom_bitmap_mb']} | "
            f"{br['bloom_build_wall_s']} | {br['hash_build_wall_s']} | "
            f"{br['screen_wall_min_s']} (avg {br['screen_wall_s']}) | "
            f"{br['antijoin_wall_min_s']} (avg {br['antijoin_wall_s']}) | "
            f"{br['fp_rate']} | {br['confirm_rows_worst']:,} of "
            f"{br['n_batch']:,} |"
            for br in bloom_results
        ],
        "",
        "The screen's per-batch wall grows strictly slower than the "
        "baseline's across the corpus growth: its only corpus-"
        "dependent leg is the exact-confirm scan of the md5 hash "
        "artifact (~33 bytes/doc on disk whatever the document "
        "length — gated above), and bloom negatives skip even that.  "
        "On this deliberately short-doc corpus that is still ~0.18x "
        "the text bytes; on real ~KB/doc corpora it is ~0.03x.  The "
        "one-time artifacts scale with the corpus (built once, lake-"
        "materialized by the ingest screen, amortized over every "
        "subsequent batch).  The in-memory anti-join baseline is "
        "cheaper in absolute terms AT THIS SCALE — the whole corpus "
        "sits in page cache — but its per-batch cost is a full "
        "corpus-text re-scan: at 100 TB that dominates every ingest "
        "tick, while the screen pays the map-only bitmap test plus "
        "a ~30x-smaller artifact scan probed only by the positive "
        "slice (gated above to touch only dups + ~fpp of new docs).",
    ]
    if emb_results:
        lines += [
            "",
            "## Embedding-side scale-stress (SemDeDup / LSH / IVF)",
            "",
            f"Adversarial vectors (dim {EMB_DIM}): 25% clone clusters "
            f"of 3 at cosine ~{round(1/(1+EMB_CLONE_EPS**2), 3)}, 20% "
            f"one dense blob at ~{round(1/(1+EMB_BLOB_EPS**2), 4)} "
            "(every blob pair a true near-dup — the degenerate "
            "duplicate class), 55% isotropic.  All runs use the BLAS "
            "(`method=\"numpy\"`) paths — the zip_with SQL paths are "
            "oracle-determinism surfaces, measured ~35x slower at "
            "200K (434s -> 12.3s for 2-round k-means).  With cells ~ "
            "sqrt(N) the assignment model is O(N^1.5), so the linear "
            "x headroom gate is CONSERVATIVE for k-means/SemDeDup; "
            "LSH bits grow as log2(N/80) to pin bucket size, and its "
            "single-table recall prediction (1-theta/pi)^bits is "
            "re-derived per scale (recall decay with bits is why "
            "SemDeDup, not the LSH screen, is the recall-bearing "
            "path).",
            "",
            "| n_vecs | cells | kmeans (s) | semdedup 1p/2p (s) | "
            "clusters deduped 1p -> 2p | collapsed 1p -> 2p | blob "
            "kept 2p | false drops | lsh bits | lsh (s) | lsh recall "
            "(theory) |",
            "| --- | --- | --- | --- | --- | --- | --- | --- | --- |"
            " --- | --- |",
            *[
                f"| {e['n_vecs']:,} | {e['n_cells']} | "
                f"{e['kmeans_wall_s']} | {e['semdedup_wall_s_p1']} / "
                f"{e['semdedup_wall_s']} | "
                f"{e['clusters_deduped_frac_p1']} -> "
                f"{e['clusters_deduped_frac']} | "
                f"{e['clusters_collapsed_frac_p1']} -> "
                f"{e['clusters_collapsed_frac']} | {e['blob_kept']} / "
                f"{e['blob_rows']:,} | {e['unique_false_drops']} | "
                f"{e['lsh_bits']} | "
                f"{e['lsh_wall_s']} | {e['lsh_clone_recall']} "
                f"({e['lsh_recall_analytic']}) |"
                for e in emb_results
            ],
            "",
            "Clusters not collapsed to one survivor straddle a "
            "Voronoi boundary (members assigned to different cells) — "
            "the SemDeDup within-cell approximation's one loss mode, "
            "and it GROWS with cell count (1-probe collapse degrades "
            "from 20K to 200K).  `n_probe_cells=2` (each row also "
            "pairs in its second-nearest cell) recovers the boundary "
            "splits for ~1.5x the wall — the production "
            "recommendation, and the gated configuration here.",
        ]
        if ivf_result is not None:
            lines += [
                "",
                f"IVF ANN at {ivf_result['n_vecs']:,} vectors, "
                f"{ivf_result['n_queries']} isotropic queries: "
                f"recall@10 = {ivf_result['recall_at_10']} "
                f"(brute {ivf_result['brute_wall_s']}s vs IVF "
                f"{ivf_result['ivf_wall_s']}s including quantizer "
                "build; isotropic corpora are the documented "
                "worst-case for probe_frac — clustered real "
                "embeddings reach the same recall scanning far "
                "less).",
            ]
        if quant_result is not None:
            qd = quant_result
            lines += [
                "",
                f"Compressed-domain search at {qd['n_vecs']:,} "
                f"vectors ({qd['n_queries']} queries, measured "
                "parquet bytes): raw "
                f"{qd['raw_bytes'] // 1024 // 1024} MiB -> int8 "
                f"{qd['sq_bytes'] // 1024 // 1024} MiB "
                f"({qd['sq_compression']}x) -> PQ 8x256 "
                f"{qd['pq_bytes'] // 1024 // 1024} MiB "
                f"({qd['pq_compression']}x).  Search: brute float "
                f"{qd['brute_wall_s']}s; int8 {qd['sq_wall_s']}s at "
                f"recall@10 {qd['sq_recall_at_10']}; PQ ADC "
                f"top-{qd['pq_pool']} + "
                f"exact re-rank {qd['pq_search_wall_s']}s at recall@10 "
                f"{qd['pq_recall_at_10']} (one-off: train "
                f"{qd['pq_train_wall_s']}s, encode "
                f"{qd['pq_encode_wall_s']}s, int8 encode "
                f"{qd['sq_encode_wall_s']}s).  At 100 TB the scan "
                "stage reads the coded table and raw vectors serve "
                f"only the Q x {qd['pq_pool']} re-rank pool.",
            ]
        if auto_probe_result is not None:
            a = auto_probe_result
            lines += [
                "",
                f"probe_frac=\"auto\" on a CLUSTERED corpus "
                f"({a['n_vecs']:,} vectors, {a['n_clusters']} "
                f"clusters, {a['n_cells']} k-means cells, "
                f"{a['n_queries']} queries): the measure-then-tune "
                f"loop picks {a['auto_n_probe']} probes vs the "
                f"isotropic-calibrated default {a['default_n_probe']} "
                f"— search {a['auto_wall_s']}s "
                f"(+{a['tune_wall_s']}s one-off calibration) vs "
                f"{a['fixed_wall_s']}s, recall@10 "
                f"{a['auto_recall_at_10']} vs "
                f"{a['fixed_recall_at_10']} (floor 0.9; brute "
                f"baseline {a['brute_wall_s']}s).",
            ]
        if inc_sem_result is not None:
            i = inc_sem_result
            lines += [
                "",
                f"Incremental SemDeDup ({i['n_batch']:,}-row daily "
                f"batch vs the other {i['n_vecs'] - i['n_batch']:,} "
                f"rows as corpus): full rebuild {i['full_wall_s']}s; "
                f"incremental with the corpus assignment recomputed "
                f"from vectors {i['incremental_wall_s']}s; with the "
                f"MATERIALIZED assignment (the previous full run's "
                f"own output, the production daily path) "
                f"{i['incremental_materialized_wall_s']}s.  Batch "
                f"verdicts byte-identical to the full run in all "
                f"three configurations "
                f"({i['parity_mismatches']}/"
                f"{i['parity_mismatches_materialized']} mismatches).",
            ]
    if rel_results:
        lines += [
            "",
            "## Relational scale-stress (joins / windows / rollups)",
            "",
            "TPC-H-shaped synthetic orders (3 lineitems each, "
            "customers ~ orders/10) through the four representative "
            "analytics plan shapes — broadcast-dim fact join + agg "
            "(Q5), per-customer RANGE-frame window, "
            "aggregate-then-join-back HAVING (Q18), and the "
            "double partial->final cohort matrix:",
            "",
            "| n_orders | revenue_by_nation (s) | "
            "rolling_customer_spend (s) | large_orders (s) | "
            "cohort_retention (s) |",
            "| --- | --- | --- | --- | --- |",
            *[
                f"| {r['n_orders']:,} | {r['revenue_wall_s']} | "
                f"{r['rolling_wall_s']} | {r['large_orders_wall_s']} | "
                f"{r['cohort_wall_s']} |"
                for r in rel_results
            ],
        ]
    lines += [
        "",
        "## Skewed aggregation",
        "",
        "| n_events | salted_sum (s) | plain groupBy (s) | total "
        "mismatches |",
        "| --- | --- | --- | --- |",
        *[
            f"| {e['n_events']:,} | {e['salted_wall_s']} | "
            f"{e['plain_wall_s']} | {e['salt_mismatches']} |"
            for e in event_results
        ],
    ]
    if asof_result is not None:
        lines += [
            "",
            "## As-of join under extreme key skew",
            "",
            f"{asof_result['n_rows_per_side']:,} rows per side, ONE "
            "key holding 50% of both — the unsalted per-key window "
            "sort is a single-task straggler by construction; "
            "`salt_buckets=32` splits the hot key's timeline into 32 "
            "independently-sorted time buckets with pre-aggregated "
            "carry-in boundaries (byte-identical output):",
            "",
            "| variant | wall (s) | worst stage max/median |",
            "| --- | --- | --- |",
            f"| unsalted | {asof_result['unsalted_wall_s']} | "
            f"{asof_result['unsalted_worst_ratio']}x |",
            f"| salt_buckets=32 | {asof_result['salted_wall_s']} | "
            f"{asof_result['salted_worst_ratio']}x |",
            "",
            f"Output mismatches: {asof_result['mismatches']}.",
        ]
    lines += [
        "",
        "## Straggler audit (heaviest stages, Spark UI taskSummary)",
        "",
        "| phase | stage | tasks | median task (ms) | max task (ms) |"
        " max/median |",
        "| --- | --- | --- | --- | --- | --- |",
    ]
    for label, s, ok in straggler_rows:
        if "error" in s:
            lines.append(f"| {label} | - | - | - | - | {s['error']} |")
        else:
            flag = "" if ok else " **FAIL**"
            lines.append(
                f"| {label} | {s['stage']} | {s['tasks']} | "
                f"{s['median_ms']} | {s['max_ms']} | "
                f"{s['ratio']}x{flag} |"
            )
    lines += [
        "",
        "## Raw results",
        "",
        "```json",
        json.dumps(
            {
                "documents": doc_results,
                "span_dedup": span_results,
                "bpe": bpe_results,
                "bpe_depth": bpe_depth,
                "selection": sel_results,
                "wet": wet_results,
                "bloom": bloom_results,
                "uncapped": uncapped,
                "embeddings": emb_results,
                "ivf_search": ivf_result,
                "ivf_auto_probe": auto_probe_result,
                "incremental_semdedup": inc_sem_result,
                "events": event_results,
                "relational": rel_results,
                "asof_hot_key": asof_result,
            },
            indent=2,
        ),
        "```",
        "",
    ]
    Path(args.out).write_text("\n".join(lines))
    print(f"wrote {args.out}: {'PASS' if ok_all else 'FAIL'}")
    for name, ok in checks:
        print(f"  [{'ok' if ok else 'FAIL'}] {name}")
    return 0 if ok_all else 1


if __name__ == "__main__":
    raise SystemExit(main())
