"""Near-duplicate detection for document corpora (extension surface,
SURVEY.md §7.2 step 6): MinHash + LSH banding with exact-Jaccard
verification, built entirely from Catalyst expressions.

Algorithm (the standard shingle -> minhash -> band -> bucket-join
pipeline, e.g. Broder 1997 / MMDS ch.3):

1. shingle: distinct word n-grams per doc (a per-row map, no shuffle)
2. minhash: per band b, signature = min over shingles of
   md5(b || '|' || shingle).  Using the md5 *string* minimum is a
   valid min-hash family — md5 imposes a pseudo-random total order on
   shingles, a different one per band salt — and it stays
   byte-identical in any engine with md5 (our DuckDB oracle).
3. candidates: docs sharing a (band, signature) bucket — an equi-join
   on the bucket key.  At 100 TB this is the step that turns N^2
   comparison into sum-of-bucket^2; the join is a plain hash shuffle
   Catalyst handles, and hot buckets (boilerplate docs) are capped by
   ``cap_hot_buckets`` via ``max_bucket_size``.
4. verify: exact Jaccard over the distinct shingle sets, keep pairs
   >= threshold.

No Python UDFs anywhere.  Since r11 the hot path is FLAT: shingles
explode as per-position rows (:func:`shingle_rows`) and the per-band
minima aggregate over the multiset (:func:`banded_bucket_keys`) — the
array-building ``transform``/``array_distinct`` expressions are
interpreted, not codegen'd, and measured ~2x the whole signature
stage; the min-hash is invariant under duplicate shingles, so set
semantics are only materialized for candidate docs in the verify.
``with_shingles``/``minhash_signatures`` remain as the array-shaped
reference implementations (tests pin the two shapes equal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_shingles(
    df: DataFrame, text_col: str = "text", n: int = 3
) -> DataFrame:
    """Distinct word n-gram shingle set per document; drops docs with
    fewer than ``n`` tokens (no shingle support).

    The shingle expression itself is guarded for short docs — Spark
    ``sequence(1, 0)`` counts DOWN (yielding a slice at start 0,
    a runtime error), and the ``filter`` alone does not protect the
    expression: the optimizer can inline the collapsed projection
    into operators evaluated alongside the predicate, so a 2-token
    doc crashed the whole plan (surfaced by the streaming span stage,
    which legitimately shortens docs below ``n``)."""
    toks = F.split(F.col(text_col), " ")
    n_sh = F.size(toks) - (n - 1)
    seq = F.when(n_sh >= 1, F.sequence(F.lit(1), n_sh)).otherwise(
        F.expr("CAST(array() AS array<int>)")
    )
    shingles = F.array_distinct(
        F.transform(
            seq,
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    )
    return df.filter(F.size(toks) >= n).withColumn("shingles", shingles)


def shingle_rows(
    df: DataFrame, text_col: str = "text", n: int = 3,
    id_col: str = "doc_id",
) -> DataFrame:
    """Flat NON-DISTINCT ``(id, sh)`` word n-gram rows — the codegen
    shape of :func:`with_shingles` (r11): Spark's higher-order array
    functions (``transform``/``array_distinct``) are interpreted, so
    building the per-doc shingle ARRAY cost ~2x the whole signature
    stage at sf0.1; exploding the start positions and building each
    shingle string as a flat projection whole-stage-compiles.

    No per-doc dedup here, ON PURPOSE: the min-hash signature is
    invariant under duplicates (min over a multiset == min over its
    set), so the signature path needs no ``array_distinct`` (an
    interpreted per-row hash set) and no distinct shuffle; consumers
    that need SET semantics (the exact-Jaccard verify) apply
    ``.distinct()`` AFTER pruning to candidate docs, so the dedup
    shuffle carries only candidates, never the corpus.

    Same short-doc guard as :func:`with_shingles`: the ``sequence``
    expression is conditioned, not just filtered, because the
    optimizer may evaluate an inlined projection alongside the
    predicate."""
    toks = F.split(F.col(text_col), " ")
    base = df.select(F.col(id_col), toks.alias("_toks")).filter(
        F.size("_toks") >= n
    )
    n_sh = F.size("_toks") - (n - 1)
    seq = F.when(n_sh >= 1, F.sequence(F.lit(1), n_sh)).otherwise(
        F.expr("CAST(array() AS array<int>)")
    )
    return base.select(
        id_col, F.explode(seq).alias("_i"), "_toks"
    ).select(
        id_col,
        F.concat_ws(" ", F.slice(F.col("_toks"), F.col("_i"), n)).alias(
            "sh"
        ),
    )


def banded_bucket_keys(
    flat: DataFrame, n_bands: int = 8, id_col: str = "doc_id"
) -> DataFrame:
    """``(id, bs)`` banded minhash bucket keys from flat
    :func:`shingle_rows` — one partial->final min-aggregate per band
    over the multiset, then each band's 32-bit min hashed with its
    band id into the 64-bit join key.  The per-band minima are the
    SAME md5-substring values ``minhash_signatures`` computes (parsed
    to longs — same winner per band, see inline note), so two docs
    share a bucket exactly when they share a band minimum, with the
    whole stage codegen'd, hash-aggregated (no sort), and the shuffle
    carrying one row per doc per partition after map-side combine."""
    n_md5 = (n_bands + 3) // 4
    hashed = flat.select(
        id_col,
        *[
            F.md5(
                F.col("sh")
                if i == 0
                else F.concat(F.lit(f"{i}|"), F.col("sh"))
            ).alias(f"_h{i}")
            for i in range(n_md5)
        ],
    )
    # minima as LONGS, not hex substrings (r12): min over a string
    # buffer forces SortAggregate — Spark sorted the whole corpus
    # shingle stream by doc before the partial agg, twice per
    # signature pass — while a fixed-width long buffer hash-
    # aggregates with map-side combine and no sort.  The 8-hex-char
    # slices are fixed-length same-alphabet strings, so their
    # lexicographic min IS the numeric min of the parsed value: the
    # same shingle wins every band.  The xxhash64 bucket key hashes
    # the long instead of the string — different key VALUES, same
    # key EQUALITY structure on (band, min), and a cross-value
    # collision (2^-64, already the accepted risk of hashing the
    # join key at all) only ever ADDS a candidate for the exact
    # verify to price.
    mins = hashed.groupBy(id_col).agg(
        *[
            F.min(
                F.conv(
                    F.substring(F.col(f"_h{b // 4}"), (b % 4) * 8 + 1, 8),
                    16,
                    10,
                ).cast("long")
            ).alias(f"_m{b}")
            for b in range(n_bands)
        ]
    )
    return mins.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.xxhash64(F.lit(b), F.col(f"_m{b}"))
                    for b in range(n_bands)
                ]
            )
        ).alias("bs"),
    )


def _count_jaccard_verify(
    cand: DataFrame,
    flat_a: DataFrame,
    flat_b: DataFrame,
    a_col: str,
    b_col: str,
    threshold: float,
) -> DataFrame:
    """Exact-Jaccard verify over candidate pairs WITHOUT per-doc
    shingle arrays (r11): with both sides' flat shingle rows DISTINCT
    per doc, ``|A∩B|`` is one equi-join on (pair, shingle) + count and
    ``|A∪B| = |A| + |B| - |A∩B|`` exactly — the same integers the
    ``array_intersect``/``array_union`` expressions produced, so the
    division yields a bit-identical double.  The interpreted per-pair
    array set-ops (and the arrays themselves) disappear from the
    plan.

    ``cand`` must be materialized by the caller (it is consumed by
    the size join and the intersect join).  ``flat_a`` / ``flat_b``
    are DISTINCT ``({a_col}|{b_col}, sh)`` rows covering at least the
    candidate docs.  Zero-intersection pairs survive as jaccard 0.0
    via the left join, exactly like the array formulation."""
    sz_a = flat_a.groupBy(a_col).agg(F.count(F.lit(1)).alias("_sa"))
    sz_b = flat_b.groupBy(b_col).agg(F.count(F.lit(1)).alias("_sb"))
    # provably-lossless size prefilter (see minhash_near_dup_pairs)
    pre = (
        cand.join(sz_a, a_col)
        .join(sz_b, b_col)
        .filter(
            (F.col("_sa") >= threshold * F.col("_sb"))
            & (F.col("_sb") >= threshold * F.col("_sa"))
        )
    )
    inter = (
        pre.select(a_col, b_col)
        .join(flat_a, a_col)
        .join(flat_b, [b_col, "sh"])
        .groupBy(a_col, b_col)
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    c = F.coalesce("_c", F.lit(0))
    verified = pre.join(inter, [a_col, b_col], "left").select(
        a_col,
        b_col,
        (c / (F.col("_sa") + F.col("_sb") - c)).alias("_j"),
    )
    # filter on the UNROUNDED jaccard (rounding is display-only —
    # same contract as the array formulation it replaces)
    return verified.filter(F.col("_j") >= threshold).select(
        a_col, b_col, F.round("_j", 6).alias("jaccard")
    )


def minhash_signatures(
    df: DataFrame, n_bands: int = 8, shingle_col: str = "shingles"
) -> DataFrame:
    """One (doc_id, band, signature) row per band: the per-band
    minimum of a 32-bit (8 hex char) hash of each shingle.

    Hash family: md5 number ``b // 4`` of the shingle (salted with the
    md5 index past the first) sliced at offset ``(b % 4) * 8`` — four
    independent-enough 32-bit projections per md5, so 8 bands cost 2
    md5 evaluations per shingle instead of 8 (the md5s were the
    dominant signature cost).  32-bit band signatures keep bucket
    collisions negligible while staying byte-identical in the DuckDB
    oracle (same substr/md5 arithmetic).

    Shape chosen for codegen: explode the shingle set once, compute
    the hashes as FLAT projection columns (Spark's higher-order array
    functions are interpreted; flat md5 columns whole-stage-compile),
    then one partial->final min-aggregate per band and an unpivot to
    (band, sig) rows.  The shuffle carries n_bands 8-char minima per
    doc."""
    n_md5 = (n_bands + 3) // 4
    ex = df.select("doc_id", F.explode(shingle_col).alias("_sh"))
    hashed = ex.select(
        "doc_id",
        *[
            F.md5(
                F.col("_sh")
                if i == 0
                else F.concat(F.lit(f"{i}|"), F.col("_sh"))
            ).alias(f"_h{i}")
            for i in range(n_md5)
        ],
    )
    mins = hashed.groupBy("doc_id").agg(
        *[
            F.min(
                F.substring(F.col(f"_h{b // 4}"), (b % 4) * 8 + 1, 8)
            ).alias(f"_m{b}")
            for b in range(n_bands)
        ]
    )
    band_sigs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"), F.col(f"_m{b}").alias("sig")
            )
            for b in range(n_bands)
        ]
    )
    return (
        mins.select("doc_id", F.explode(band_sigs).alias("bs"))
        .select(
            "doc_id",
            F.col("bs.band").alias("band"),
            F.col("bs.sig").alias("sig"),
        )
    )


def jaccard(a: F.Column, b: F.Column) -> F.Column:
    """Exact Jaccard similarity of two distinct-element arrays.

    ``|A∪B| = |A| + |B| - |A∩B|`` exactly (both inputs are distinct
    by contract), so only the intersection array is materialized —
    ``array_union`` built a second throwaway array per pair for a
    size the three cheap ``size()`` calls already determine (r11).
    Same integers, bit-identical quotient."""
    i = F.size(F.array_intersect(a, b))
    return i / (F.size(a) + F.size(b) - i)


def cap_hot_buckets(
    df: DataFrame,
    bucket_col: str,
    max_bucket_size: int | None,
    log_dropped: bool = False,
) -> DataFrame:
    """Drop every row of LSH buckets larger than ``max_bucket_size``
    BEFORE the quadratic bucket self-join — the guard rail for
    boilerplate-heavy corpora, where one shared header/footer puts a
    large fraction of all docs in a single bucket and the per-bucket
    quadratic candidate join degenerates to the global N^2 this whole
    pipeline exists to avoid (the classic 100 TB dedup failure).

    RECALL TRADEOFF (documented, intentional): a pair is lost only if
    EVERY bucket it shares is hot.  For multi-band MinHash a true
    near-dup pair collides in ~(J^rows_per_band) of the bands, so
    moderate caps cost little recall while bounding the worst bucket
    at ``max_bucket_size^2`` candidates; a corpus where near-all docs
    are mutual near-dups (hot bucket = real duplicate class) should
    instead be exact-deduped first (``text.exact_dedup``).

    The size scan is a partial->final count on the same key the
    candidate join shuffles on, and the anti-join's hot side is tiny
    (it holds only over-cap bucket KEYS), so AQE broadcasts it.

    ``log_dropped=True`` runs one extra (tiny) job to count and log
    the dropped buckets — keep it off in lazy library paths.
    """
    if max_bucket_size is None:
        return df
    counts = df.groupBy(bucket_col).agg(
        F.count(F.lit(1)).alias("_bucket_n")
    )
    hot = counts.filter(F.col("_bucket_n") > max_bucket_size).select(
        bucket_col
    )
    if log_dropped:
        import logging

        n_hot = hot.count()
        if n_hot:
            logging.getLogger(__name__).warning(
                "cap_hot_buckets: dropping %d bucket(s) larger than %d "
                "rows before candidate generation (recall tradeoff "
                "documented in cap_hot_buckets docstring)",
                n_hot,
                max_bucket_size,
            )
    return df.join(hot, bucket_col, "left_anti")


def minhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    shingle_n: int = 3,
    n_bands: int = 8,
    threshold: float = 0.5,
    max_bucket_size: int | None = None,
    persist_shingles: bool = True,
) -> DataFrame:
    """End-to-end near-dup pairs: shingle -> minhash bands ->
    bucket-join candidates -> exact-Jaccard verify.

    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b and
    jaccard >= threshold, rounded to 6 dp.

    ``max_bucket_size`` caps LSH bucket fan-out before the candidate
    self-join (see :func:`cap_hot_buckets` for the recall tradeoff) —
    set it on boilerplate-heavy corpora where one shared template
    would otherwise make a single bucket quadratic.

    ``persist_shingles`` is retained for API compatibility and is now
    a no-op (r11): the flat-shingle pipeline never materializes a
    corpus-wide shingle table — the signature pass streams the
    multiset rows straight into the per-band min-aggregate, and the
    verify re-shingles only CANDIDATE docs (semi-join prune below the
    explode), so there is nothing corpus-sized left to cache and no
    cache entry to leak (the ADVICE r3 concern this flag existed
    for)."""
    from kafka_sparkstreaming_sbt_spark.plans import parallelize_for_compute

    del persist_shingles  # no corpus-wide intermediate left to cache
    # shingling/hashing is compute-bound: spread the byte-small doc
    # table across all cores before the heavy per-row work
    docs = parallelize_for_compute(df)
    # join on a 64-bit hash of (band, sig) instead of the 32-char md5
    # string: a collision only ADDS a candidate pair (the exact-Jaccard
    # verify rejects it), never drops a true one — identical results,
    # 8-byte shuffle keys
    sigs = banded_bucket_keys(
        shingle_rows(docs, text_col, shingle_n), n_bands
    )
    sigs = cap_hot_buckets(sigs, "bs", max_bucket_size)
    # materialize the (doc, bs) key table ONCE before the self-join
    # (r12): the join's two sides are separate plan leaves — the
    # broadcast side does NOT reuse the probe side's exchange — so
    # the whole shingle+md5+min signature pipeline executed twice;
    # the table is 8 slim rows per doc, the checkpoint is nearly free
    sigs = sigs.localCheckpoint(eager=True)
    cand = (
        sigs.alias("x")
        .join(
            sigs.alias("y"),
            (F.col("x.bs") == F.col("y.bs"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    # the candidate pair set feeds the candidate-doc prune AND the
    # verify joins; left lazy each consumer would re-execute the whole
    # signature pipeline.  It is id pairs only — materialize once
    # (localCheckpoint blocks die with the RDD, no cache-entry leak;
    # the incremental_near_dup precedent).
    cand = cand.localCheckpoint(eager=True)
    # DISTINCT shingles of CANDIDATE docs only: the semi-join sits
    # BELOW the explode (only candidate docs are re-tokenized), so
    # the set-dedup shuffle carries candidates, never the corpus —
    # at 100 TB the corpus-wide shingle stream is shuffled exactly
    # zero times in this whole operator.
    cand_ids = cand.select(
        F.explode(F.array("doc_a", "doc_b")).alias("doc_id")
    ).distinct()
    # eager: the table feeds four verify leaves (both size counts and
    # both sides of the intersect join, via the renames below) — left
    # lazy the candidate re-shingle subtree replays per leaf and the
    # plan carries four copies of it (measured: the checkpoint is
    # also slightly faster locally, 3.57 vs 3.78 s interleaved)
    cflat = shingle_rows(
        docs.join(cand_ids, "doc_id", "left_semi"), text_col, shingle_n
    ).distinct().localCheckpoint(eager=True)
    # candidate volume is DATA-DEPENDENT (boilerplate-heavy corpora
    # explode LSH buckets), so no forced broadcast here: AQE picks the
    # join strategy from actual runtime sizes — same policy as
    # simhash_near_dup_pairs.
    return _count_jaccard_verify(
        cand,
        cflat.withColumnRenamed("doc_id", "doc_a"),
        cflat.withColumnRenamed("doc_id", "doc_b"),
        "doc_a",
        "doc_b",
        threshold,
    )


def banded_signature_table(
    docs: DataFrame,
    text_col: str = "text",
    shingle_n: int = 3,
    n_bands: int = 8,
    compute_partitions: int | None = None,
) -> DataFrame:
    """The corpus-side MinHash artifact a daily ingest pipeline
    materializes once per full build and appends to per batch:
    ``(doc_id, bs)`` banded-bucket keys (one row per doc per band).
    Pass it to :func:`incremental_near_dup` as ``corpus_signatures``
    to skip the full-corpus re-shingle — the dominant recurring cost
    of the self-contained screen.  Append-only per doc: a new batch's
    accepted rows contribute exactly their own signature rows.

    ``compute_partitions`` overrides the default full-core
    repartition — the right setting for a CORPUS build, but per-task
    overhead dominates for a few-thousand-row streaming micro-batch,
    where the caller knows the input is small and passes a small
    count (the ingest screen's per-batch maintenance does)."""
    from kafka_sparkstreaming_sbt_spark.plans import parallelize_for_compute

    spread = (
        docs.repartition(compute_partitions)
        if compute_partitions is not None
        else parallelize_for_compute(docs)
    )
    # flat multiset shingles -> per-band mins (r11): identical keys,
    # no interpreted per-row array build (see shingle_rows)
    return banded_bucket_keys(
        shingle_rows(spread, text_col, shingle_n), n_bands
    )


def incremental_near_dup(
    new_docs: DataFrame,
    corpus_docs: DataFrame,
    text_col: str = "text",
    shingle_n: int = 3,
    n_bands: int = 8,
    threshold: float = 0.5,
    max_bucket_size: int | None = None,
    corpus_signatures: DataFrame | None = None,
) -> DataFrame:
    """Incremental near-dup check — the daily-ingest shape: screen a
    NEW batch against an EXISTING corpus without re-pairing the corpus
    with itself.  Returns (new_doc_id, dup_of, jaccard) where
    ``dup_of`` is a corpus doc with J >= threshold (a new doc appears
    once per matching corpus doc; aggregate downstream to keep/drop).

    Scale shape vs the full :func:`minhash_near_dup_pairs`:

    - the bucket join is new-batch x corpus (|new| << |corpus|), not
      corpus x corpus — the daily cost is proportional to the batch;
    - the corpus contributes only its (doc_id, bucket) signature rows
      to the join — in production that side is a MATERIALIZED
      signature table maintained across ingests (signatures are
      append-only per doc): build it with
      :func:`banded_signature_table` and pass it as
      ``corpus_signatures`` to skip the full-corpus re-shingle
      entirely; when omitted it is re-computed from text for
      self-containment;
    - corpus text is re-shingled ONLY for docs that appear in a
      candidate pair (semi-join prune before the verify), so the
      verify never rescans the 100 TB text column.
    """
    from kafka_sparkstreaming_sbt_spark.plans import parallelize_for_compute

    def _sigs(docs: DataFrame) -> DataFrame:
        s = banded_bucket_keys(
            shingle_rows(
                parallelize_for_compute(docs), text_col, shingle_n
            ),
            n_bands,
        )
        return cap_hot_buckets(s, "bs", max_bucket_size)

    # production passes the materialized signature table; the hot-
    # bucket cap still applies to it (pileups grow as ingests append)
    corpus_sigs = (
        cap_hot_buckets(
            corpus_signatures.select("doc_id", "bs"),
            "bs",
            max_bucket_size,
        )
        if corpus_signatures is not None
        else _sigs(corpus_docs)
    )
    cand = (
        _sigs(new_docs)
        .alias("x")
        .join(
            corpus_sigs.alias("y"),
            (F.col("x.bs") == F.col("y.bs"))
            & (F.col("x.doc_id") != F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("new_doc_id"),
            F.col("y.doc_id").alias("dup_of"),
        )
        .distinct()
    )
    # the candidate pair set feeds BOTH the verify join and the
    # candidate-doc prunes below; left lazy, each consumer re-executes
    # the whole signature build (shingle+minhash of corpus AND batch —
    # measured ~40% of query wall).  It is id pairs only, so
    # materialize it once; localCheckpoint is eager and its blocks die
    # with the RDD, so no cache-entry leak (the ADVICE r3 persist()
    # concern).
    cand = cand.localCheckpoint(eager=True)
    # verify: only CANDIDATE docs (both sides) are re-shingled — the
    # semi-join sits below the explode, and the set-dedup the exact
    # Jaccard needs runs over candidates only (r11: the multiset
    # signature pass needs no dedup at all; see shingle_rows).  The
    # batch side is re-shingled once more than before — it is the
    # SMALL side by contract, and the corpus-side economics are
    # unchanged (never re-shingled beyond candidates).
    # NOT checkpointed, unlike minhash_near_dup_pairs' cflat: each
    # side feeds four verify leaves, but both tables are candidate-
    # pruned and the replayed subtrees overlap on otherwise-idle
    # cores, while two eager checkpoints serialize behind store
    # passes — MEASURED 0.9 s slower (3.55 vs 2.66 s back-to-back at
    # sf0.1, r12).  Same lesson as ngram_jaccard_pairs' prefix table:
    # materialize-once is a candidate-volume tradeoff, not a rule.
    new_cand = shingle_rows(
        parallelize_for_compute(new_docs).join(
            cand.select(F.col("new_doc_id").alias("doc_id")).distinct(),
            "doc_id",
            "left_semi",
        ),
        text_col,
        shingle_n,
    ).distinct().withColumnRenamed("doc_id", "new_doc_id")
    corpus_cand = shingle_rows(
        parallelize_for_compute(corpus_docs).join(
            cand.select(F.col("dup_of").alias("doc_id")).distinct(),
            "doc_id",
            "left_semi",
        ),
        text_col,
        shingle_n,
    ).distinct().withColumnRenamed("doc_id", "dup_of")
    return _count_jaccard_verify(
        cand, new_cand, corpus_cand, "new_doc_id", "dup_of", threshold
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.6,
) -> DataFrame:
    """EXACT n-gram Jaccard pairs (>= ``threshold``) — the
    non-approximate sibling of :func:`minhash_near_dup_pairs`, made
    scalable with PREFIX FILTERING (AllPairs / PPJoin, Bayardo 2007 /
    Xiao 2008):

    Under any global total order on shingles, two sets with
    ``J >= t`` MUST share an element among each set's first
    ``|A| - ceil(t*|A|) + 1`` shingles — so only that prefix of each
    doc's postings enters the candidate self-join.  Ordering shingles
    rarest-first (ascending document frequency, then lexicographic)
    makes those prefix postings the most selective ones: frequent
    boilerplate shingles sort to the suffix and never generate
    candidates, which removes the hot-bucket quadratic blowup a plain
    inverted-index join has (measured 1.13M candidate pairs -> 300K at
    sf0.1; the gap widens with corpus boilerplate) with NO
    approximation — the final exact-Jaccard verify over the full
    shingle sets defines the result.
    """
    from kafka_sparkstreaming_sbt_spark.plans import parallelize_for_compute

    # The shingle ARRAYS stay load-bearing here, unlike the minhash
    # path (r11): this operator's candidate set is orders of
    # magnitude larger (~300 K pairs at sf0.1 vs ~600), so a
    # count-join verify would explode to a Σ|A| (pair, shingle) row
    # intermediate and shuffle it — measured ~1 s SLOWER than the
    # per-pair array intersect, which reads the two persisted arrays
    # with no shuffle.  One array build, persisted, feeds the
    # inverted postings and both verify sides.
    docs = with_shingles(parallelize_for_compute(df), text_col, n).select(
        "doc_id", "shingles"
    )
    docs = docs.persist()
    inv = docs.select("doc_id", F.explode("shingles").alias("sh"))
    sh_df = inv.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    # canonical rarest-first order is (df, sh); a per-doc window rank
    # realizes it without materializing/sorting per-doc arrays (one
    # sort within the doc partition, reused by the size count)
    from pyspark.sql import Window

    by_doc = Window.partitionBy("doc_id")
    rank_w = by_doc.orderBy("df", "sh")
    ranked = (
        inv.join(sh_df, "sh")
        .select(
            "doc_id",
            "sh",
            F.row_number().over(rank_w).alias("rn"),
            F.count(F.lit(1)).over(by_doc).alias("n_sh"),
        )
    )
    prefix_len = (
        F.col("n_sh") - F.ceil(F.lit(threshold) * F.col("n_sh")) + 1
    )
    # candidate join on the shingle's 64-bit hash: collisions only add
    # candidates (exact verify filters them), so results are identical
    # and the quadratic join shuffles 8-byte keys.  n_sh rides along
    # so the LOSSLESS length filter (J >= t requires t·|B| <= |A|,
    # exactly the verify's own prefilter) prunes candidate pairs IN
    # the join, before the distinct and the two array joins (r12).
    # NOT checkpointed: materializing the prefix table before the
    # self-join was MEASURED 2.4x slower (10.8 vs 4.6 s back-to-back
    # at sf0.1) — the twin window pipelines overlap across cores,
    # while the checkpoint serializes them behind one store pass.
    prefix = ranked.filter(F.col("rn") <= prefix_len).select(
        "doc_id", F.xxhash64("sh").alias("shh"), "n_sh"
    )
    cand = (
        prefix.alias("x")
        .join(
            prefix.alias("y"),
            (F.col("x.shh") == F.col("y.shh"))
            & (F.col("x.doc_id") < F.col("y.doc_id"))
            & (F.col("x.n_sh") >= threshold * F.col("y.n_sh"))
            & (F.col("y.n_sh") >= threshold * F.col("x.n_sh")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    a = docs.select(
        F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a")
    )
    b = docs.select(
        F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b")
    )
    verified = (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        # same lossless size prefilter as minhash_near_dup_pairs
        .filter(
            (F.size("sh_a") >= threshold * F.size("sh_b"))
            & (F.size("sh_b") >= threshold * F.size("sh_a"))
        )
        .select(
            "doc_a",
            "doc_b",
            jaccard(F.col("sh_a"), F.col("sh_b")).alias("_j"),
        )
    )
    # unrounded filter, display-only rounding (see minhash variant)
    return verified.filter(F.col("_j") >= threshold).select(
        "doc_a", "doc_b", F.round("_j", 6).alias("jaccard")
    )
