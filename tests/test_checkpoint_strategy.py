"""Durable-checkpoint strategy (VERDICT r4 #1): every iterative operator
routes its lineage cuts through ``session.checkpoint`` — ``localCheckpoint``
locally (fast, executor block storage), parquet write-through under
``SPARK_GRAFT_DURABLE_CHECKPOINT`` (fault-tolerant: a lost executor in round
40 of a BPE train replans from the last round's parquet instead of killing
the job) — and produces hash-identical results in BOTH modes.

Both-modes coverage: the default-mode side of every query here is already
hash-checked by tests/test_oracle_parity.py; this file re-runs one
representative per iterative module under the durable flag and asserts the
SAME DuckDB oracle, plus a structural pin that no bare ``localCheckpoint``
remains outside the helper.
"""

from __future__ import annotations

import pathlib

import pytest

from apachebeam_python_spark import queries as q
from apachebeam_python_spark.session import checkpoint

from .parity import assert_parity

PKG = pathlib.Path(__file__).resolve().parent.parent / "apachebeam_python_spark"

#: one representative per module that cuts lineage:
#: operators/dedup.py (connected components + lazy gram table),
#: operators/graph.py (PageRank power iteration), queries/corpus_lm.py
#: (BPE merge rounds), queries/analytics.py (k-core peel — lazy cut — and
#: the Markov round tables), queries/experiments.py (BFS frontier + the
#: shared PPJoin gram subtree).
ITERATIVE = [
    "q_dedup_clusters",
    "q_pagerank",
    "q_bpe_learn",
    "q_kcore",
    "q_markov_attribution",
    "q_bfs_reachability",
    "q_setsim_join",
    "q_scc",
    "q_closeness_centrality",
    "q_betweenness",
]


def test_no_bare_localcheckpoint_outside_the_helper():
    """The checkpoint strategy is a single choke point: session.checkpoint.
    A new .localCheckpoint() anywhere else silently reintroduces the
    non-fault-tolerant path at 100 TB."""
    offenders = [
        p.relative_to(PKG).as_posix()
        for p in PKG.rglob("*.py")
        if p.name != "session.py" and ".localCheckpoint(" in p.read_text()
    ]
    assert offenders == [], (
        f"bare localCheckpoint outside session.checkpoint: {offenders}"
    )


@pytest.mark.parametrize("name", ITERATIVE)
def test_iterative_query_hash_green_under_durable_mode(
    name, spark, ddb, sf_dir, tmp_path, monkeypatch
):
    root = tmp_path / "ckpt"
    monkeypatch.setenv("SPARK_GRAFT_DURABLE_CHECKPOINT", str(root))
    df = q.QUERIES[name](spark, sf_dir)
    assert_parity(df, ddb, q.ORACLES[name], name=name)
    # the write-through actually engaged (round dirs on disk), i.e. this
    # test did not silently run the localCheckpoint path. q_pagerank's LIVE
    # path at fixture scale is the r11 single-task Arrow kernel, which
    # deliberately checkpoints nothing (the lineage is consumed once);
    # its distributed loop's durable-mode engagement is pinned in
    # tests/test_pagerank_paths.py::test_distributed_path_durable_checkpoint.
    if name != "q_pagerank":
        assert list(root.glob("round_*")), "durable mode never wrote a round"


def test_durable_checkpoint_survives_empty_round_table(spark, tmp_path, monkeypatch):
    """An empty round table (e.g. a converged frontier) writes zero parquet
    part files; the read-back must use the writer's schema, not inference —
    inference over a bare _SUCCESS marker throws."""
    monkeypatch.setenv("SPARK_GRAFT_DURABLE_CHECKPOINT", str(tmp_path / "c"))
    df = spark.range(5).filter("id < 0")
    back = checkpoint(df)
    assert back.count() == 0
    # names+types survive exactly; nullability is forced to True by the file
    # source (Spark file scans never trust writer non-nullness) — harmless:
    # hash parity compares names/types/values, never nullability
    assert [(f.name, f.dataType.simpleString()) for f in back.schema] == [
        (f.name, f.dataType.simpleString()) for f in df.schema
    ]


def test_durable_checkpoint_preserves_rows_and_types(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_DURABLE_CHECKPOINT", str(tmp_path / "c"))
    from pyspark.sql import functions as F

    df = spark.range(10).select(
        "id",
        F.col("id").cast("decimal(38,0)").alias("d"),
        F.timestamp_micros(F.col("id") * 1_000_000).alias("ts"),
        F.array(F.col("id"), F.col("id") + 1).alias("arr"),
    )
    back = checkpoint(df)
    assert [(f.name, f.dataType.simpleString()) for f in back.schema] == [
        (f.name, f.dataType.simpleString()) for f in df.schema
    ]
    assert sorted(back.collect()) == sorted(df.collect())
