"""Training-set assembly: chunking, deterministic shuffling, and
contiguous sequence packing (extension surface — the operators an
LLM pretraining-data pipeline runs AFTER cleaning/dedup turn a
document lake into training sequences).

All three are pure DataFrame compositions — codegen'd splits,
``posexplode`` fan-out, and per-shard window functions.  Nothing is
driver-side and nothing windows without a partition:

- **chunking** is a map + generate (rows grow ~n_tokens/stride per
  doc, no shuffle at all);
- **shuffle/pack** shuffles ONCE on the shard key and sorts within
  shards — a deterministic global permutation without a global sort:
  md5 is uniform, so shards are skew-free by construction, and each
  shard's sort is independent (100 TB / n_shards per sort, pick
  n_shards to size them).

Everything is engine-portable arithmetic (md5 hex, instr, integer
div/mod) so every stage carries an exact DuckDB oracle — no RNG
state anywhere, reruns and task retries can't reorder the output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 32,
    stride: int = 24,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sliding-window token chunks: starts 0, stride, 2*stride, ...
    while < n_tokens; each chunk keeps up to ``chunk_tokens`` tokens
    (the final chunks are shorter — kept, so no text is dropped;
    filter ``n_tokens`` downstream if short tails are unwanted).

    ``stride < chunk_tokens`` gives overlapping chunks (overlap =
    chunk_tokens - stride), the usual retrieval/embedding setup.
    Whole pipeline is split -> ``posexplode(sequence(...))`` ->
    ``slice`` — per-row codegen, zero shuffle, partitioning preserved.
    """
    if stride <= 0:
        raise ValueError(f"stride must be positive, got {stride}")
    toks = F.split(F.col(text_col), r"\s+")
    with_chunks = (
        df.select(F.col(id_col), toks.alias("_toks"))
        .withColumn("_n", F.size("_toks"))
        .filter(F.col("_n") > 0)
        .select(
            id_col,
            "_toks",
            F.posexplode(
                F.sequence(F.lit(0), F.col("_n") - 1, F.lit(stride))
            ).alias("chunk_index", "_start"),
        )
    )
    chunk = F.slice(F.col("_toks"), F.col("_start") + 1, chunk_tokens)
    return with_chunks.select(
        id_col,
        F.col("chunk_index").cast("long").alias("chunk_index"),
        F.col("_start").cast("long").alias("token_start"),
        F.size(chunk).cast("long").alias("n_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


def drop_duplicate_chunks(
    df: DataFrame,
    chunk_tokens: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document chunk-level dedup, the C4 "three-sentence span"
    rule re-expressed over fixed-width token chunks (the corpus here
    is a token stream with no sentence boundaries): every
    ``chunk_tokens``-token span that occurs more than once in the
    WHOLE corpus is kept only at its first occurrence (lowest
    (doc_id, chunk_index)) and removed everywhere else, and each
    document is reassembled from its surviving chunks in order.

    Returns (doc_id, clean_text, n_chunks, n_dropped); a document
    whose every chunk was seen earlier comes back with an empty
    ``clean_text`` (drop or filter downstream).

    Scale shape: one shuffle keyed by the chunk text to elect first
    occurrences (partial->final ``min`` — boilerplate chunks combine
    map-side, so a chunk repeated a million times contributes one row
    per task to the shuffle, which is exactly the skew that matters),
    one join back on the same key (co-partitioned; Catalyst reuses
    the exchange), and ONE reassembly aggregation keyed by doc: every
    chunk row carries a keep flag into the agg, so kept text, total
    and dropped counts come out of the same pass — no separate
    per-doc totals branch, no extra scan, no final join.  Nothing
    driver-side, no windows without partitions.
    """
    chunks = chunk_documents(
        df, chunk_tokens, chunk_tokens, text_col, id_col
    )
    # first occurrence = lexicographic struct-min over (doc, chunk):
    # same partial->final agg shape as a packed long, but with no
    # range constraint (a packed id*2^24+index key silently corrupts
    # the election for >=2^24 chunks or negative ids, and overflows
    # ANSI arithmetic near 2^39 ids)
    ordk = F.struct(F.col(id_col), F.col("chunk_index"))
    # materialize-once (r12): keyed feeds the first-occurrence agg
    # AND the flag join — each used to re-run the chunk explode
    keyed = chunks.select(
        id_col, "chunk_index", "chunk_text", ordk.alias("_ord")
    ).localCheckpoint(eager=False)
    firsts = keyed.groupBy("chunk_text").agg(
        F.min("_ord").alias("_first_ord")
    )
    flagged = keyed.join(firsts, "chunk_text").select(
        id_col,
        "chunk_index",
        "chunk_text",
        (F.col("_ord") == F.col("_first_ord")).alias("_keep"),
    )
    cells = F.array_sort(
        F.collect_list(F.struct("chunk_index", "_keep", "chunk_text"))
    )
    clean = F.array_join(
        F.transform(
            F.filter(cells, lambda s: s._keep), lambda s: s.chunk_text
        ),
        " ",
    )
    return flagged.groupBy(id_col).agg(
        clean.alias("clean_text"),
        F.count(F.lit(1)).alias("n_chunks"),
        (
            F.count(F.lit(1)) - F.sum(F.col("_keep").cast("long"))
        ).alias("n_dropped"),
    )


def remove_common_chunks(
    df: DataFrame,
    chunk_tokens: int = 8,
    min_docs: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Frequency-based boilerplate removal (the RefinedWeb/CCNet
    "line-wise correction"): every ``chunk_tokens``-token span that
    occurs in at least ``min_docs`` DISTINCT documents is treated as
    boilerplate (nav bars, headers, license banners, cookie notices)
    and removed from **every** document — including the first
    occurrence, which is what distinguishes this from
    :func:`drop_duplicate_chunks`' C4 first-wins rule: boilerplate is
    noise everywhere, not content somewhere.  Documents are reassembled
    from surviving chunks in order; returns
    ``(doc_id, clean_text, n_chunks, n_removed)``.

    Scale shape: chunking is zero-shuffle codegen; the document
    frequency needs chunk rows DISTINCT on (chunk, doc) first —
    ``count(distinct doc)`` in one agg would carry every occurrence
    row into the shuffle, the two-phase distinct-then-count keeps the
    per-chunk shuffle load at one row per (chunk, doc) with map-side
    combine (the ``corpus_stats`` two-phase-distinct pattern).  The
    flag join back is an equi-join on the chunk key, co-partitioned
    with the count's exchange; the common-chunk table is usually small
    (boilerplate is by definition a thin head of the distribution) but
    its cardinality is data-dependent, so no forced broadcast — AQE
    picks from the realized size.  Reassembly is the same single
    doc-keyed agg as :func:`drop_duplicate_chunks`."""
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    # materialize-once (r12): the chunk stream feeds the doc-freq agg
    # AND the flag join — each used to re-run the tokenize + chunk
    # explode
    chunks = (
        chunk_documents(df, chunk_tokens, chunk_tokens, text_col, id_col)
        .select(id_col, "chunk_index", "chunk_text")
        .localCheckpoint(eager=False)
    )
    doc_freq = (
        chunks.select(id_col, "chunk_text")
        .distinct()
        .groupBy("chunk_text")
        .agg(F.count(F.lit(1)).alias("_df"))
    )
    common = doc_freq.filter(F.col("_df") >= min_docs).select(
        "chunk_text", F.lit(True).alias("_boiler")
    )
    flagged = chunks.join(common, "chunk_text", "left").select(
        id_col,
        "chunk_index",
        "chunk_text",
        F.coalesce(~F.col("_boiler"), F.lit(True)).alias("_keep"),
    )
    cells = F.array_sort(
        F.collect_list(F.struct("chunk_index", "_keep", "chunk_text"))
    )
    clean = F.array_join(
        F.transform(
            F.filter(cells, lambda s: s._keep), lambda s: s.chunk_text
        ),
        " ",
    )
    return flagged.groupBy(id_col).agg(
        clean.alias("clean_text"),
        F.count(F.lit(1)).alias("n_chunks"),
        (
            F.count(F.lit(1)) - F.sum(F.col("_keep").cast("long"))
        ).alias("n_removed"),
    )


def remove_duplicate_spans(
    df: DataFrame,
    window_tokens: int = 16,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact duplicated-substring removal (the suffix-array dedup of
    Lee et al. 2022, "Deduplicating Training Data Makes Language
    Models Better", re-expressed as a declarative window-hash plan):
    every ``window_tokens``-token window occurring at ANY position in
    at least ``min_docs`` DISTINCT documents marks its token range,
    per document the marked ranges are merged into maximal spans
    (gaps-and-islands), and the spans are excised from EVERY
    document.  Unlike :func:`drop_duplicate_chunks` (fixed chunk
    grid, first occurrence wins) this catches duplicated text at
    arbitrary alignment — the case a chunk grid misses when copies
    drift by a few tokens.  Removing all occurrences (not
    all-but-one) is the conservative training-set convention: a span
    shared verbatim between distinct documents is boilerplate or
    contamination, not content.  Within-document repeats are NOT
    touched (the duplicate test is DISTINCT doc ids >= ``min_docs``)
    — intra-doc repetition is ``repetition_stats``' job.

    Returns ``(doc_id, clean_text, n_spans, tokens_removed)``;
    ``clean_text`` is reassembled from surviving tokens (whitespace
    normalized to single spaces, the same convention as every
    reassembly here), documents shorter than ``window_tokens`` pass
    through with 0 spans.

    Scale shape: the window fan-out is ~n_tokens rows per doc
    (stride 1 — ``window_tokens``x the chunk grid's row count; that
    is the price of alignment-free matching, and it is a map-side
    explode, not a shuffle).  The shuffle key is md5 of the window
    text: 32 bytes however wide the window, collision-free at any
    realistic corpus size (2^128), and byte-identical in DuckDB so
    the oracle groups on the very same key.  Document frequency is
    the two-phase distinct-then-count (one row per (window, doc)
    into the shuffle, map-side combined), the flag join back is an
    equi-join on the md5 key co-partitioned with the count's
    exchange, the island merge windows PARTITION BY doc (never a
    global window), and excision is a per-row higher-order filter of
    the doc's tokens against its own merged-span array — codegen'd,
    zero shuffle after the span aggregation."""
    if window_tokens < 2:
        raise ValueError(
            f"window_tokens must be >= 2, got {window_tokens}"
        )
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    w = window_tokens
    # materialize ONCE (r12, guide §1.2): the tokenized frame feeds
    # the window explode AND the excision join-back, and the window
    # stream feeds the dup aggregation AND the hit join — left as
    # plan references the executed plan re-ran the full tokenize +
    # md5-per-window explode once per consumer (two Generate subtrees
    # in the r11 plan).  Lazy checkpoints: the first action
    # materializes each frame once and every consumer reads the
    # stored blocks.
    base = _tokenized(df, text_col, id_col).localCheckpoint(eager=False)
    wins = _window_marks(base, w, id_col).localCheckpoint(eager=False)
    dup = (
        wins.select(id_col, "_h")
        .distinct()
        .groupBy("_h")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") >= min_docs)
        .select("_h")
    )
    hits = wins.join(dup, "_h").select(id_col, "_start")
    return _excise_marked(base, hits, w, id_col)


def _tokenized(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, _toks, _n) — the shared tokenization convention
    (regex-whitespace split, mirrored by the oracles'
    ``string_split_regex``)."""
    return (
        df.select(
            F.col(id_col),
            F.split(F.col(text_col), r"\s+").alias("_toks"),
        )
        .withColumn("_n", F.size("_toks"))
        .filter(F.col("_n") > 0)
    )


def _window_marks(base: DataFrame, w: int, id_col: str) -> DataFrame:
    """(id, _start, _h): md5 of every w-token window at stride 1 —
    map-side explode, no shuffle; 32-byte key regardless of w."""
    return (
        base.filter(F.col("_n") >= w)
        .select(
            id_col,
            "_toks",
            # guard the expression, not just the filter: Spark
            # sequence(0, -k) counts DOWN and the optimizer can
            # evaluate an inlined projection alongside the predicate
            # (the with_shingles lesson, dedup_fuzzy.py)
            F.explode(
                F.when(
                    F.col("_n") >= w,
                    F.sequence(F.lit(0), F.col("_n") - w),
                ).otherwise(F.expr("CAST(array() AS array<int>)"))
            ).alias("_start"),
        )
        .select(
            id_col,
            "_start",
            F.md5(
                F.array_join(
                    F.slice("_toks", F.col("_start") + 1, w), " "
                )
            ).alias("_h"),
        )
    )


def _excise_marked(
    base: DataFrame, hits: DataFrame, w: int, id_col: str
) -> DataFrame:
    """Shared tail of the span-dedup family: merge marked window
    starts into maximal spans per doc (gaps-and-islands, PARTITION BY
    doc) and excise them with a higher-order token filter."""
    byq = Window.partitionBy(id_col).orderBy("_start")
    prev_end = F.max(F.col("_start") + w).over(
        byq.rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = hits.withColumn(
        "_brk",
        F.when(
            F.col("_start") > F.coalesce(prev_end, F.lit(-1)), 1
        ).otherwise(0),
    ).withColumn("_isl", F.sum("_brk").over(byq))
    spans = islands.groupBy(id_col, "_isl").agg(
        F.min("_start").cast("long").alias("s"),
        (F.max("_start") + w).cast("long").alias("e"),
    )
    per_doc = spans.groupBy(id_col).agg(
        F.array_sort(F.collect_list(F.struct("s", "e"))).alias(
            "_spans"
        ),
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.sum(F.col("e") - F.col("s")).alias("tokens_removed"),
    )
    joined = base.join(per_doc, id_col, "left").withColumn(
        "_spans",
        F.coalesce(
            F.col("_spans"),
            F.expr("CAST(array() AS array<struct<s:bigint,e:bigint>>)"),
        ),
    )
    kept = F.filter(
        "_toks",
        lambda t, i: ~F.exists(
            F.col("_spans"),
            lambda sp: (i >= sp.s) & (i < sp.e),
        ),
    )
    return joined.select(
        id_col,
        F.array_join(kept, " ").alias("clean_text"),
        F.coalesce(F.col("n_spans"), F.lit(0)).cast("long").alias(
            "n_spans"
        ),
        F.coalesce(F.col("tokens_removed"), F.lit(0))
        .cast("long")
        .alias("tokens_removed"),
    )


def window_hash_table(
    docs: DataFrame,
    window_tokens: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The corpus-side artifact a daily span-dedup ingest
    materializes once and appends to per accepted batch: one ``wh``
    row per DISTINCT window hash in the corpus (the
    :func:`~.dedup_fuzzy.banded_signature_table` pattern).  Pass it
    to :func:`remove_duplicate_spans_incremental` as
    ``corpus_hashes`` to skip the full-corpus re-windowing — the
    dominant recurring cost of a self-contained daily screen.
    Append-only per doc: an accepted batch contributes exactly its
    own windows' hashes (membership is all the incremental screen
    tests, so duplicates across appends are harmless — dedup on
    compaction, not on the write path)."""
    base = _tokenized(docs, text_col, id_col)
    return (
        _window_marks(base, window_tokens, id_col)
        .select(F.col("_h").alias("wh"))
        .distinct()
    )


def remove_duplicate_spans_incremental(
    new_docs: DataFrame,
    corpus_docs: DataFrame | None = None,
    corpus_hashes: DataFrame | None = None,
    window_tokens: int = 16,
    min_docs_within: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Daily-ingest duplicated-span excision: clean a NEW batch
    against an EXISTING corpus without ever re-pairing the corpus
    with itself.  A batch window is duplicated when it occurs in the
    corpus (one corpus occurrence + this one >= 2 distinct docs) OR
    in at least ``min_docs_within`` distinct docs of the batch
    itself; marked windows merge and excise exactly as in
    :func:`remove_duplicate_spans`.  With ``min_docs_within=2`` the
    output is IDENTICAL to running the full operator over
    corpus+batch and keeping the batch rows — the corpus side of
    that equivalence never executes (corpus docs are not cleaned:
    they were already screened when they were batches).

    Scale shape: the corpus contributes only its DISTINCT window-hash
    set — in production a MATERIALIZED :func:`window_hash_table`
    maintained across ingests (pass ``corpus_hashes``; the
    ``corpus_docs`` path recomputes it, the documented floor without
    the artifact).  The membership probe is a left-semi join of the
    batch's distinct hashes against the table — daily cost
    proportional to the batch, never to the corpus; the corpus table
    shuffles only its 32-byte keys."""
    if (corpus_docs is None) == (corpus_hashes is None):
        raise ValueError(
            "pass exactly one of corpus_docs / corpus_hashes"
        )
    if corpus_hashes is None:
        corpus_hashes = window_hash_table(
            corpus_docs, window_tokens, text_col, id_col
        )
    if min_docs_within < 2:
        raise ValueError(
            f"min_docs_within must be >= 2, got {min_docs_within}"
        )
    # same materialize-once shape as remove_duplicate_spans (r12):
    # wins feeds THREE consumers here (within-batch dup agg, corpus
    # membership probe, hit join) — each used to replay the tokenize
    # + md5 explode
    base = _tokenized(new_docs, text_col, id_col).localCheckpoint(
        eager=False
    )
    wins = _window_marks(base, window_tokens, id_col).localCheckpoint(
        eager=False
    )
    within = (
        wins.select(id_col, "_h")
        .distinct()
        .groupBy("_h")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") >= min_docs_within)
        .select("_h")
    )
    corpus_hit = (
        wins.select("_h")
        .distinct()
        .join(
            corpus_hashes.select(F.col("wh").alias("_h")),
            "_h",
            "left_semi",
        )
    )
    dup = within.unionByName(corpus_hit).distinct()
    hits = wins.join(dup, "_h").select(id_col, "_start")
    return _excise_marked(base, hits, window_tokens, id_col)


def duplicated_span_report(
    df: DataFrame,
    window_tokens: int = 16,
    top_k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Observability for the span-dedup family (the
    ``key_skew_report`` pattern: measure before you spend): the
    ``top_k`` most-duplicated ``window_tokens``-token windows as
    ``(span_text, n_docs, n_occurrences, window_md5)`` — what the
    shared licence block / nav chrome / syndicated paragraph actually
    IS, and how much of the corpus carries it, before committing to
    an excision run or choosing ``min_docs``.

    Scale shape: counting runs entirely on the 32-byte md5 key
    (two-phase (hash, doc) partial counts -> per-hash doc/occurrence
    totals with map-side combine — never an expand for a distinct
    aggregate), the cut is a TakeOrderedAndProject over (n_docs,
    n_occurrences, hash) — hash as the total-order tiebreak so the
    LIMIT is deterministic on any engine — and window TEXT is
    recovered only for the k winners: the lowest (doc, start)
    occurrence per winning hash joins back to its tokenized doc and
    slices the window out, so no window string ever enters a
    shuffle."""
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    # materialize-once (r12): wins feeds the counting agg AND the
    # winner text recovery; base feeds the explode AND the final
    # token-slice join
    base = _tokenized(df, text_col, id_col).localCheckpoint(eager=False)
    wins = _window_marks(base, window_tokens, id_col).localCheckpoint(
        eager=False
    )
    per_doc = wins.groupBy("_h", id_col).agg(
        F.count(F.lit(1)).alias("_c")
    )
    counts = (
        per_doc.groupBy("_h")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("_c").cast("long").alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= 2)
    )
    top = counts.orderBy(
        F.desc("n_docs"), F.desc("n_occurrences"), F.col("_h")
    ).limit(top_k)
    rep = (
        wins.join(top.select("_h"), "_h")
        .groupBy("_h")
        .agg(
            F.min(
                F.struct(
                    F.col(id_col).alias("d"),
                    F.col("_start").alias("s"),
                )
            ).alias("_r")
        )
        .select(
            "_h",
            F.col("_r.d").alias(id_col),
            F.col("_r.s").alias("_start"),
        )
    )
    txt = rep.join(base, id_col).select(
        "_h",
        F.array_join(
            F.slice("_toks", F.col("_start") + 1, window_tokens), " "
        ).alias("span_text"),
    )
    return top.join(txt, "_h").select(
        "span_text",
        "n_docs",
        "n_occurrences",
        F.col("_h").alias("window_md5"),
    )


def _hex_val(h, pos: int):
    """0-15 value of hex char ``pos`` (1-based) of column ``h`` from
    its ascii code — engine-portable arithmetic (Spark and DuckDB
    don't share a hex-to-int builtin, but ascii/substr agree):
    '0'-'9' -> 48-57, 'a'-'f' -> 97-102."""
    c = F.ascii(F.substring(h, pos, 1))
    return F.when(c <= 57, c - 48).otherwise(c - 87)


def deterministic_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: int = 42,
    n_shards: int = 16,
) -> DataFrame:
    """Deterministic pseudo-random global permutation for training
    order: md5 over (id, seed) ranks every row; rows are sharded by
    the hash's first byte (uniform, skew-free) and ordered within
    shards — global order = (shard, pos_in_shard) without any global
    sort or driver collect.  A new ``seed`` is a fresh epoch
    permutation; task retries can't reroute rows (no RNG state).
    """
    h = F.md5(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(seed)))
    hashed = df.withColumn("_h", h).withColumn(
        "shard",
        ((_hex_val(F.col("_h"), 1) * 16 + _hex_val(F.col("_h"), 2))
         % n_shards).cast("long"),
    )
    w = Window.partitionBy("shard").orderBy("_h", id_col)
    return hashed.withColumn(
        "pos_in_shard", F.row_number().over(w).cast("long")
    ).drop("_h")


def pack_documents(
    df: DataFrame,
    seq_len: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 42,
    n_shards: int = 16,
) -> DataFrame:
    """Contiguous sequence packing (the standard pretraining layout):
    shuffle deterministically, then concatenate each shard's token
    stream in shuffle order and cut it into ``seq_len``-token
    sequences.  Each doc's placement is closed-form from the running
    token total: it starts at offset ``(cum - n) % seq_len`` of
    sequence ``(cum - n) // seq_len`` (docs may span sequence
    boundaries — that's the contract of packed pretraining batches;
    add BOS/EOS in the tokenizer stage).

    One shuffle (shard key) + per-shard running sum — the prefix sums
    never leave their shard, so scale cost is sort(|shard|), chosen
    via ``n_shards``.
    """
    n_tok = F.size(F.split(F.col(text_col), r"\s+"))
    shuffled = deterministic_shuffle(
        df.select(F.col(id_col), F.col(text_col)).withColumn(
            "n_tokens", n_tok.cast("long")
        ),
        id_col=id_col,
        seed=seed,
        n_shards=n_shards,
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("pos_in_shard")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    started = cum - F.col("n_tokens")
    return shuffled.select(
        id_col,
        "shard",
        "pos_in_shard",
        "n_tokens",
        F.floor(started / seq_len).cast("long").alias("seq_index"),
        (started % seq_len).cast("long").alias("seq_offset"),
    )
