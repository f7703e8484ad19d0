"""The fluent Pipeline facade must be pure sugar: chains produce exactly the
same results (and plans) as the underlying operator calls."""

from __future__ import annotations

from pyspark.sql import functions as F

from apachebeam_python_spark import queries as q
from apachebeam_python_spark.pipeline import Pipeline
from apachebeam_python_spark.session import table


def test_wordcount_chain_matches_query(spark, sf_dir):
    via_chain = (
        Pipeline.of(table(spark, sf_dir, "documents"))
        .flat_map(F.split("text", " "), "word")
        .count_per_element("word")
        .to_df()
    )
    via_query = q.QUERIES["q_wordcount"](spark, sf_dir)
    assert {tuple(r) for r in via_chain.collect()} == {
        tuple(r) for r in via_query.collect()
    }


def test_flagship_shape_chain(spark, sf_dir):
    out = (
        Pipeline.of(table(spark, sf_dir, "lineitem"))
        .filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .map(revenue=F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .combine_per_key(
            ["l_returnflag", "l_linestatus"],
            total=F.round(F.sum("revenue"), 4),
            n=F.count("*"),
        )
        .to_df()
    )
    rows = out.collect()
    assert len(rows) == 6 and all(r.n > 0 for r in rows)


def test_create_and_join_chain(spark, sf_dir):
    dim = Pipeline.create(
        spark, [("N", "returned-no"), ("R", "returned-yes"), ("A", "returned-ack")],
        "l_returnflag string, label string",
    )
    out = (
        Pipeline.of(table(spark, sf_dir, "lineitem"))
        .combine_per_key(["l_returnflag"], n=F.count("*"))
        .join_broadcast(dim, "l_returnflag")
        .to_df()
    )
    got = {(r.l_returnflag, r.label) for r in out.collect()}
    assert {"N", "R", "A"} == {f for f, _ in got}


def test_window_session_chain(spark, sf_dir):
    out = (
        Pipeline.of(table(spark, sf_dir, "events"))
        .window_session("ts", "30 minutes", ["user_id"], n=F.count("*"))
        .to_df()
    )
    via_query = q.QUERIES["q_session_window"](spark, sf_dir)
    assert out.count() == via_query.count()


def test_corpus_operator_chain(spark, sf_dir):
    """The LLM-corpus facade methods compose like any other transform."""
    docs = Pipeline.of(table(spark, sf_dir, "documents"))
    groups = docs.dedup_exact("text", "doc_id").to_df()
    assert groups.count() == table(spark, sf_dir, "documents").count()  # fixture has no dups

    snapshot = table(spark, sf_dir, "documents")
    batch = Pipeline.of(
        snapshot.selectExpr("doc_id + 1000000 AS doc_id", "text")
    )
    assert batch.dedup_against(snapshot, "text").to_df().count() == 0  # all re-crawls

    hits = docs.bm25(["hash", "join"], "text", "doc_id", k=5).to_df()
    assert hits.count() == 5


def test_lake_facade_round_trip(spark, tmp_path):
    """Lake-table methods on the facade: create → append → merge → read
    with time travel, identical to calling sources/laketable directly."""
    path = str(tmp_path / "lake")
    base = Pipeline.of(spark.range(10).selectExpr("id", "id * 2 AS v"))
    assert base.lake_create(path) == 0
    assert Pipeline.of(
        spark.range(10, 15).selectExpr("id", "id * 2 AS v")
    ).lake_append(path) == 1
    assert Pipeline.of(
        spark.createDataFrame([(3, 999), (20, 1)], "id long, v long")
    ).lake_merge(path, key="id") == 2
    rows = {r.id: r.v for r in Pipeline.read_lake(spark, path).to_df().collect()}
    assert rows[3] == 999 and rows[20] == 1 and len(rows) == 16
    assert Pipeline.read_lake(spark, path, version=0).to_df().count() == 10


def test_r6_facade_completions(spark, sf_dir):
    """Round-6 facade completions delegate to the one operator
    implementation: Partition covers the input disjointly, WithKeys
    attaches a key, Latest.PerKey equals max_by, GroupIntoBatches caps
    batch sizes, Sample is fixed-size and deterministic, and semi/anti
    joins partition the left side."""
    from pyspark.sql import functions as F

    from apachebeam_python_spark.pipeline import Pipeline
    from apachebeam_python_spark.session import table

    e = table(spark, sf_dir, "events")
    p = Pipeline.of(e)

    parts = p.partition_into(F.col("user_id") % 3, 3)
    assert sum(q.to_df().count() for q in parts) == e.count()

    keyed = p.with_keys(F.col("user_id") % 10, "k").to_df()
    assert "k" in keyed.columns

    latest = p.latest_per_key(["user_id"], "value", "ts").to_df()
    expect = (
        e.groupBy("user_id").agg(F.max_by("value", "ts").alias("latest")).collect()
    )
    assert {(r.user_id, r.latest) for r in latest.select("user_id", "latest").collect()} == {
        (r.user_id, r.latest) for r in expect
    }

    batches = p.group_into_batches(["user_id"], "event_id", 50).to_df()
    assert batches.select(F.max(F.size("batch"))).first()[0] <= 50

    s1 = p.sample_fixed(25).to_df().collect()
    s2 = p.sample_fixed(25).to_df().collect()
    assert len(s1) == 25 and {r.event_id for r in s1} == {r.event_id for r in s2}

    urgent = Pipeline.of(
        table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    )
    c = Pipeline.of(table(spark, sf_dir, "customer"))
    on = F.col("c_custkey") == F.col("o_custkey")
    n_semi = c.join_semi(urgent, on).to_df().count()
    n_anti = c.join_anti(urgent, on).to_df().count()
    assert n_semi + n_anti == table(spark, sf_dir, "customer").count()


def test_registered_facade_query_plan_equals_direct_twin(spark, sf_dir):
    """Round 7 (VERDICT r6 #5): the facade-built registry query
    q_pipeline_facade must compile to the IDENTICAL physical plan as its
    direct-DataFrame twin — sugar, not semantics, pinned at the plan level
    (the value level is pinned by its DuckDB oracle in the parity sweep)."""
    from apachebeam_python_spark.plans.inspect import plan_fingerprint
    from apachebeam_python_spark.queries.facade import direct_twin

    via_facade = q.QUERIES["q_pipeline_facade"](spark, sf_dir)
    via_direct = direct_twin(spark, sf_dir)
    assert plan_fingerprint(via_facade) == plan_fingerprint(via_direct)
    # and the values agree (cheap at test sf; the oracle hash is the real pin)
    assert sorted(map(tuple, via_facade.collect())) == sorted(
        map(tuple, via_direct.collect())
    )
