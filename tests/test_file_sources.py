"""File source/sink round-trips: explicit-schema JSON/CSV readers
(batch + streaming), partition-pruned parquet lake writes, and the
gated Avro surface."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from kafka_sparkstreaming_sbt_spark.schemas import TRANSACTION_SCHEMA
from kafka_sparkstreaming_sbt_spark.sources.avro import avro_available
from kafka_sparkstreaming_sbt_spark.sources.files import (
    read_csv,
    read_json,
    write_partitioned_parquet,
)


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp()
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_json_roundtrip_with_schema(spark, tmpdir):
    lines = [
        '{"transaction_id":"f1","customer_id":"1","merchant_id":5,'
        '"timestamp":"2025-03-10T12:00:00Z","amount":10.5,'
        '"payment_method":"UPI","status":"Success"}',
        '{"transaction_id":"f2","customer_id":"2","merchant_id":6,'
        '"timestamp":"2025-03-10T12:01:00Z","amount":20.0,'
        '"payment_method":"PayPal","status":"Failed"}',
        "not json at all",  # PERMISSIVE -> all-null row
    ]
    with open(f"{tmpdir}/a.json", "w") as f:
        f.write("\n".join(lines))
    df = read_json(spark, tmpdir, TRANSACTION_SCHEMA)
    rows = df.collect()
    assert len(rows) == 3
    ok = [r for r in rows if r.transaction_id is not None]
    assert {r.transaction_id for r in ok} == {"f1", "f2"}
    assert df.schema == TRANSACTION_SCHEMA


def test_json_streaming_source(spark, tmpdir):
    with open(f"{tmpdir}/b.json", "w") as f:
        f.write(
            '{"transaction_id":"s1","customer_id":"9","merchant_id":1,'
            '"timestamp":"2025-03-10T13:00:00Z","amount":5.0,'
            '"payment_method":"UPI","status":"Success"}\n'
        )
    stream = read_json(spark, tmpdir, TRANSACTION_SCHEMA, streaming=True)
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("file_json_stream")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        n = spark.sql("SELECT COUNT(*) FROM file_json_stream").first()[0]
    finally:
        q.stop()
    assert n == 1


def test_csv_reader(spark, tmpdir):
    with open(f"{tmpdir}/c.csv", "w") as f:
        f.write("id,amount\n1,10.5\n2,20.0\n")
    df = read_csv(spark, tmpdir, "id long, amount double")
    assert sorted((r.id, r.amount) for r in df.collect()) == [
        (1, 10.5),
        (2, 20.0),
    ]


def test_partitioned_parquet_prunes(spark, tmpdir, sf_small):
    from kafka_sparkstreaming_sbt_spark.sources.batch import read_table

    events = read_table(spark, sf_small, "events").withColumn(
        "day", F.to_date("ts")
    )
    out = f"{tmpdir}/events_lake"
    write_partitioned_parquet(events, out, partition_by=["event_type"])
    back = spark.read.parquet(out)
    assert back.count() == events.count()
    # partition filter prunes directories: only the matching partition
    # appears in the scan
    plan = (
        back.filter(F.col("event_type") == "purchase")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "event_type=purchase" in plan or "PartitionFilters" in plan
    got = back.filter(F.col("event_type") == "purchase").count()
    want = events.filter(F.col("event_type") == "purchase").count()
    assert got == want


def test_avro_gated(spark):
    # pip-distributed PySpark has no spark-avro jar; the probe must
    # say so (and if a deployment adds the jar, the wrappers work)
    assert avro_available(spark) in (True, False)
    if not avro_available(spark):
        from kafka_sparkstreaming_sbt_spark.sources.avro import decode_avro

        try:
            decode_avro(F.col("x"), '{"type":"string"}')
        except ImportError as e:
            assert "spark-avro" in str(e)


def test_confluent_frame_split(spark):
    """Registry wire framing splits with built-in byte ops: magic 0x00
    + big-endian schema id + body; unframed payloads yield nulls."""
    import struct

    from kafka_sparkstreaming_sbt_spark.sources.avro import (
        with_confluent_frame,
    )

    body = b"\x0cavrob"  # arbitrary avro-ish bytes
    framed = b"\x00" + struct.pack(">I", 4242) + body
    big_id = b"\x00" + struct.pack(">I", 2**31 - 1) + body
    # high bit set: a corrupt/foreign frame whose unsigned magnitude
    # (>= 2^31) would CAST_OVERFLOW under ANSI with a naive int cast
    # (ADVICE r3); must decode as the signed reinterpretation instead
    # of killing the stream
    neg_id = b"\x00" + struct.pack(">I", 0x80000001) + body
    unframed = b"\x01junkpayload"
    short = b"\x00\x01"
    df = spark.createDataFrame(
        [(1, framed), (2, unframed), (3, short), (4, big_id), (5, neg_id)],
        "k long, value binary",
    )
    rows = {r.k: r for r in with_confluent_frame(df).collect()}
    assert rows[1].schema_id == 4242
    assert bytes(rows[1].avro_payload) == body
    assert rows[4].schema_id == 2**31 - 1
    assert rows[5].schema_id == -(2**31) + 1  # signed reinterpret
    assert bytes(rows[5].avro_payload) == body
    assert rows[2].schema_id is None and rows[2].avro_payload is None
    assert rows[3].schema_id is None


def test_bucketed_tables_join_without_shuffle(spark, sf_small):
    """The co-located join layout: orders and lineitem bucketed the
    same way on the join key join with ZERO Exchange — the write-time
    shuffle is paid once, every subsequent join is free.  (Broadcast
    disabled for the assertion: at real scale neither fact side fits
    in a broadcast.)"""
    from kafka_sparkstreaming_sbt_spark.sources.batch import read_table
    from kafka_sparkstreaming_sbt_spark.sources.files import (
        write_bucketed_table,
    )

    write_bucketed_table(
        read_table(spark, sf_small, "orders").select(
            "o_orderkey", "o_totalprice"
        ),
        "orders_bkt",
        bucket_by=["o_orderkey"],
        n_buckets=4,
        sort_by=["o_orderkey"],
    )
    write_bucketed_table(
        read_table(spark, sf_small, "lineitem").select(
            "l_orderkey", "l_quantity"
        ),
        "lineitem_bkt",
        bucket_by=["l_orderkey"],
        n_buckets=4,
        sort_by=["l_orderkey"],
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.table("orders_bkt")
        li = spark.table("lineitem_bkt")
        joined = o.join(
            li, o["o_orderkey"] == li["l_orderkey"]
        ).groupBy("o_orderkey").count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() > 0
        # same join against the unbucketed parquet shuffles both sides
        o_raw = read_table(spark, sf_small, "orders").select(
            "o_orderkey", "o_totalprice"
        )
        li_raw = read_table(spark, sf_small, "lineitem").select(
            "l_orderkey", "l_quantity"
        )
        raw_plan = (
            o_raw.join(li_raw, o_raw["o_orderkey"] == li_raw["l_orderkey"])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" in raw_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS orders_bkt")
        spark.sql("DROP TABLE IF EXISTS lineitem_bkt")


def test_compact_parquet_reduces_file_count(spark, tmpdir):
    """Compaction sizes output from the FS listing (no data scan) and
    preserves content exactly."""
    import glob

    from pyspark.sql import functions as F

    from kafka_sparkstreaming_sbt_spark.sources.files import (
        compact_parquet,
    )

    src = f"{tmpdir}/small_files"
    dest = f"{tmpdir}/compacted"
    spark.range(10_000).withColumn("v", F.col("id") * 2).repartition(
        64
    ).write.parquet(src)
    assert len(glob.glob(f"{src}/part-*.parquet")) == 64
    n = compact_parquet(spark, src, dest, target_file_bytes=1 << 30)
    assert n == 1
    assert len(glob.glob(f"{dest}/part-*.parquet")) == 1
    a = spark.read.parquet(src).agg(
        F.count(F.lit(1)), F.sum("v")
    ).first()
    b = spark.read.parquet(dest).agg(
        F.count(F.lit(1)), F.sum("v")
    ).first()
    assert tuple(a) == tuple(b)


def test_range_sorted_write_skips_row_groups(spark, tmpdir, sf_small):
    """Range-disjoint sorted files: a time predicate reaches the scan
    as a pushed filter AND the per-file min/max stats let parquet skip
    non-matching files (observed: selective scans read fewer rows)."""
    from kafka_sparkstreaming_sbt_spark.sources.batch import read_table
    from kafka_sparkstreaming_sbt_spark.sources.files import (
        write_range_sorted_parquet,
    )
    from pyspark.sql import functions as F

    events = read_table(spark, sf_small, "events").select(
        "event_id", "ts", "value"
    )
    dest = f"{tmpdir}/events_sorted"
    write_range_sorted_parquet(events, dest, ["ts"], n_files=8)
    out = spark.read.parquet(dest)
    hi = events.agg(F.max("ts")).first()[0]
    sel = out.filter(F.col("ts") >= hi)  # matches the last file only
    plan = sel._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts" in plan
    assert sel.count() >= 1
    # row order within files is sorted -> min/max stats are tight:
    # every file's (min, max) ranges must be pairwise disjoint
    stats = (
        out.groupBy(F.input_file_name().alias("f"))
        .agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"))
        .collect()
    )
    spans = sorted((r.lo, r.hi) for r in stats)
    assert all(a[1] <= b[0] for a, b in zip(spans, spans[1:]))


def test_zorder_layout_prunes_both_dimensions(spark, tmpdir, sf_small):
    """Z-order vs linear sort: a linear (user_id, value) sort clusters
    only its leading column — a selective value predicate touches
    nearly every file.  Morton interleaving keeps per-file min/max
    tight in BOTH dimensions, so selective predicates on either column
    touch a strict subset of files."""
    from kafka_sparkstreaming_sbt_spark.sources.batch import read_table
    from kafka_sparkstreaming_sbt_spark.sources.files import (
        write_range_sorted_parquet,
        write_zorder_parquet,
    )

    events = read_table(spark, sf_small, "events").select(
        "event_id", "user_id", "value"
    )
    linear, zord = f"{tmpdir}/ev_linear", f"{tmpdir}/ev_zorder"
    write_range_sorted_parquet(events, linear, ["user_id"], n_files=16)
    write_zorder_parquet(events, zord, "user_id", "value", n_files=16)

    def files_touched(path, pred):
        df = spark.read.parquet(path).filter(pred)
        return df.select(F.input_file_name()).distinct().count()

    # ~5% of rows: enough matches to scatter across a linear layout
    hi_val = events.stat.approxQuantile("value", [0.95], 0.001)[0]
    val_pred = F.col("value") >= hi_val
    user_pred = F.col("user_id") <= 5

    # same rows in both layouts
    n = events.filter(val_pred).count()
    assert spark.read.parquet(zord).filter(val_pred).count() == n

    # value predicate: scattered across the user-sorted layout,
    # clustered in the z-order
    assert files_touched(zord, val_pred) < files_touched(linear, val_pred)
    # user predicate: z-order still prunes (not as perfectly as the
    # dedicated linear sort, but well below all 16 files)
    assert files_touched(zord, user_pred) < 16


def test_confluent_avro_decode_roundtrip_without_jar(spark):
    """The jar-free Kafka-Avro chain (SURVEY §2.11, the serializer the
    reference declares but never wires): frames built with the
    pure-Python encoder -> with_confluent_frame -> decode_avro_payloads
    must yield the original records; non-Registry frames decode to
    all-null fields with a NULL schema_id (dead-letter contract)."""
    from kafka_sparkstreaming_sbt_spark.sources.avro_ocf import (
        decode_avro_payloads,
        encode_record_bytes,
    )
    from kafka_sparkstreaming_sbt_spark.sources.avro import (
        with_confluent_frame,
    )

    schema = {
        "type": "record",
        "name": "t",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "name", "type": ["null", "string"]},
            {"name": "amount", "type": "double"},
        ],
    }
    recs = [
        {"id": 1, "name": "a", "amount": 1.5},
        {"id": 2, "name": None, "amount": -3.25},
        {"id": 3, "name": "c" * 300, "amount": 0.0},
    ]
    frames = [
        (b"\x00" + (7 + i).to_bytes(4, "big")
         + encode_record_bytes(r, schema),)
        for i, r in enumerate(recs)
    ] + [
        (b"not avro at all",),  # foreign frame (no magic byte)
        # framed but CORRUPT: truncated body — must decode to nulls,
        # not kill the task (poison-pill contract)
        (b"\x00" + (99).to_bytes(4, "big") + b"\x07tru",),
    ]
    df = spark.createDataFrame(frames, "value binary")
    out = decode_avro_payloads(
        with_confluent_frame(df), schema, keep_cols=("schema_id",)
    )
    rows = sorted(out.collect(), key=lambda r: (r.id is None, r.id or 0))
    assert [(r.id, r.name, r.amount) for r in rows[:3]] == [
        (1, "a", 1.5),
        (2, None, -3.25),
        (3, "c" * 300, 0.0),
    ]
    assert [r.schema_id for r in rows[:3]] == [7, 8, 9]
    tail = {(r.schema_id, r.id) for r in rows[3:]}
    assert tail == {(None, None), (99, None)}  # foreign + corrupt


def test_parse_transactions_avro_feeds_the_pipeline(spark):
    """parse_transactions_avro is a drop-in source for the reference
    topology: Confluent-framed Avro transactions decode to the same
    shape parse_transactions yields from JSON, and the canonical
    transform chain aggregates them batch-mode."""
    from kafka_sparkstreaming_sbt_spark.sources.avro_ocf import (
        encode_record_bytes,
    )
    from kafka_sparkstreaming_sbt_spark.sources.kafka import (
        TRANSACTION_AVRO_SCHEMA,
        parse_transactions_avro,
    )
    from kafka_sparkstreaming_sbt_spark.streaming.pipeline import (
        aggregate_transactions,
    )

    recs = [
        {
            "transaction_id": f"t{i}",
            "customer_id": "c1",
            "merchant_id": 5,
            "timestamp": "2024-01-01 10:00:0" + str(i),
            "amount": 10.0,
            "payment_method": "card",
            "status": "ok",
        }
        for i in range(3)
    ]
    recs.append(dict(recs[0]))  # duplicate transaction_id -> deduped
    frames = [
        (b"\x00" + (1).to_bytes(4, "big")
         + encode_record_bytes(r, TRANSACTION_AVRO_SCHEMA),)
        for r in recs
    ]
    df = spark.createDataFrame(frames, "value binary")
    txn = parse_transactions_avro(df)
    assert txn.schema["timestamp"].dataType.typeName() == "timestamp"
    agg = aggregate_transactions(txn, watermark=None)
    # per-transaction windowed sums: 3 distinct txns x 10.0 each in
    # each of the 2 sliding windows covering the event (10m/5m), the
    # duplicate transaction_id deduped before aggregation
    rows = agg.collect()
    assert {r.transaction_id for r in rows} == {"t0", "t1", "t2"}
    assert sorted(r.window_total_spent for r in rows) == [10.0] * 6


def test_schema_id_aware_decode_two_generations_one_stream(spark):
    """Schema-id dispatch (VERDICT r6 #7): two writer-schema
    generations coexisting in one stream each decode with THEIR
    schema; the output is the by-name union (missing fields null),
    unknown ids go to the dead-letter path, and conflicting types
    across generations fail loudly at plan time."""
    import pytest as _pytest

    from kafka_sparkstreaming_sbt_spark.sources.avro import (
        with_confluent_frame,
    )
    from kafka_sparkstreaming_sbt_spark.sources.avro_ocf import (
        decode_avro_payloads_by_id,
        encode_record_bytes,
    )

    gen1 = {
        "type": "record",
        "name": "t",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "amount", "type": "double"},
        ],
    }
    gen2 = {  # additive evolution: new field, same shared types
        "type": "record",
        "name": "t",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "amount", "type": "double"},
            {"name": "currency", "type": ["null", "string"]},
        ],
    }
    frames = [
        (b"\x00" + (1).to_bytes(4, "big")
         + encode_record_bytes({"id": 1, "amount": 2.5}, gen1),),
        (b"\x00" + (2).to_bytes(4, "big")
         + encode_record_bytes(
             {"id": 2, "amount": 7.0, "currency": "EUR"}, gen2),),
        (b"\x00" + (1).to_bytes(4, "big")
         + encode_record_bytes({"id": 3, "amount": -1.0}, gen1),),
        # UNKNOWN generation: registered nowhere -> dead-letter nulls
        (b"\x00" + (9).to_bytes(4, "big")
         + encode_record_bytes({"id": 4, "amount": 0.0}, gen1),),
    ]
    df = spark.createDataFrame(frames, "value binary")
    out = decode_avro_payloads_by_id(
        with_confluent_frame(df), {1: gen1, 2: gen2},
        keep_cols=("schema_id",),
    )
    assert [f.name for f in out.schema.fields] == [
        "schema_id", "id", "amount", "currency",
    ]
    rows = sorted(out.collect(), key=lambda r: (r.id is None, r.id or 0))
    assert [(r.schema_id, r.id, r.amount, r.currency) for r in rows] == [
        (1, 1, 2.5, None),
        (2, 2, 7.0, "EUR"),
        (1, 3, -1.0, None),
        (9, None, None, None),  # unknown id: dead-letter, id kept
    ]

    # conflicting shared-field types are a plan-time hard error
    bad = {
        "type": "record",
        "name": "t",
        "fields": [{"name": "amount", "type": "string"}],
    }
    with _pytest.raises(ValueError, match="conflicting types"):
        decode_avro_payloads_by_id(
            with_confluent_frame(df), {1: gen1, 2: bad}
        )
