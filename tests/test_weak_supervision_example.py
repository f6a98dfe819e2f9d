"""End-to-end test of examples/weak_supervision.py: a tiny labeled
seed set + a clustered embedding space must expand into corpus-scale
labels, and the NB model trained on the propagated labels must screen
the corpus along the true class boundary — including rows the graph
never reached."""

import random
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from examples.weak_supervision import weak_supervise


def _corpus(spark, n=240, dim=8):
    """Two text classes tied to two embedding clusters, plus a few
    ISOLATED rows (no embedding -> never in the graph) that only the
    trained model can classify."""
    rng = random.Random(5)
    good = ["insight", "analysis", "report", "evidence", "method"]
    spam = ["click", "win", "free", "prize", "buy"]
    docs, embs = [], []
    for i in range(n):
        cls = i % 2
        words = [
            (good if cls else spam)[rng.randrange(5)] for _ in range(30)
        ]
        docs.append((i, " ".join(words)))
        base = [8.0 if (d < 4) == bool(cls) else 0.0 for d in range(dim)]
        embs.append(
            (i, [x + rng.gauss(0, 0.8) for x in base])
        )
    # isolated rows: text-classifiable, absent from the graph
    for i in range(n, n + 10):
        cls = i % 2
        words = [
            (good if cls else spam)[rng.randrange(5)] for _ in range(30)
        ]
        docs.append((i, " ".join(words)))
    d = spark.createDataFrame(docs, ["doc_id", "text"])
    e = spark.createDataFrame(embs, ["vec_id", "embedding"])
    return d, e


def test_weak_supervision_expands_seeds_and_screens(spark, tmp_path):
    docs, embs = _corpus(spark)
    # 6 seeds per class
    seeds = spark.createDataFrame(
        [(i, i % 2) for i in range(12)], ["vec_id", "label"]
    )
    out = str(tmp_path / "kept")
    report = weak_supervise(
        spark, docs, embs, seeds, output=out, k=8, n_buckets=256
    )
    assert report["n_docs"] == 250
    assert report["n_seeds"] == 12
    # propagation reached far beyond the seeds
    assert report["n_labeled"] >= 200
    kept = {r.doc_id for r in spark.read.parquet(out).collect()}
    # keep-side (odd ids) survives, spam side dies — including the
    # graph-absent isolated tail rows on both sides
    errs = [
        i
        for i in range(250)
        if (i % 2 == 1) != (i in kept)
    ]
    assert len(errs) <= 5, errs[:10]
    iso_good = [i for i in range(240, 250) if i % 2 == 1]
    assert all(i in kept for i in iso_good)


def test_weak_supervision_is_deterministic(spark):
    docs, embs = _corpus(spark, n=120)
    seeds = spark.createDataFrame(
        [(i, i % 2) for i in range(8)], ["vec_id", "label"]
    )
    r1 = weak_supervise(spark, docs, embs, seeds, k=6, n_buckets=128)
    r2 = weak_supervise(
        spark,
        docs.repartition(7),
        embs.repartition(5),
        seeds,
        k=6,
        n_buckets=128,
    )
    assert r1 == r2
