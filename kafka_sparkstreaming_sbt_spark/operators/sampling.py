"""Deterministic content-hash sampling and split assignment
(extension surface — training-data pipelines need REPRODUCIBLE
sampling: rerunning the pipeline, on any engine, must pick the same
rows, which rules out RNG-based ``sample()``/``sampleBy()``).

The sampling key is the first md5 nibble of the row's id — uniform
over 16 buckets, stable across engines (same ascii-arithmetic family
as operators.simhash, mirrored by the DuckDB oracle), and independent
of row order/partitioning.  Filtering happens BEFORE any shuffle, so
a 1/16 sample reads the full scan but pays 1/16 of everything
downstream — at 100 TB the sample predicate belongs as close to the
scan as possible, and a deterministic function of an id column is
exactly what the optimizer can push."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _id_nibble(id_col: str) -> Column:
    """First hex nibble (0..15) of md5(id) — the sampling key."""
    ch = F.substring(F.md5(F.col(id_col).cast("string")), 1, 1)
    v = F.ascii(ch)
    return F.when(v <= 57, v - 48).otherwise(v - 87)


def deterministic_sample(
    df: DataFrame, id_col: str, sixteenths: int = 2
) -> DataFrame:
    """Keep rows whose id-nibble < ``sixteenths`` — a stable
    ``sixteenths``/16 sample (2 -> 12.5%)."""
    return df.filter(_id_nibble(id_col) < sixteenths)


def with_split(
    df: DataFrame,
    id_col: str,
    train_upto: int = 13,
    valid_upto: int = 15,
) -> DataFrame:
    """Assign each row a reproducible train/valid/test split from its
    id-nibble: [0, train_upto) -> train, [train_upto, valid_upto) ->
    valid, rest -> test (defaults 13/2/1 sixteenths ~ 81/12/6%)."""
    nib = _id_nibble(id_col)
    return df.withColumn(
        "split",
        F.when(nib < train_upto, F.lit("train"))
        .when(nib < valid_upto, F.lit("valid"))
        .otherwise(F.lit("test")),
    )


def stratified_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    sixteenths: int = 2,
) -> DataFrame:
    """Per-stratum deterministic sample: the hash key is SALTED with
    the stratum value (md5 of ``group|id``), so each group's selection
    is an independent ``sixteenths``/16 draw — a group's members don't
    share the global sample's nibble bias, and adding a new stratum
    never changes which rows of existing strata are picked.  Same
    scan-pushable, RNG-free discipline as :func:`deterministic_
    sample`."""
    key = F.concat(
        F.col(group_col).cast("string"),
        F.lit("|"),
        F.col(id_col).cast("string"),
    )
    ch = F.substring(F.md5(key), 1, 1)
    v = F.ascii(ch)
    nib = F.when(v <= 57, v - 48).otherwise(v - 87)
    return df.filter(nib < sixteenths)
