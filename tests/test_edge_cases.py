"""Edge-case robustness: operators must behave on empty/singleton/degenerate
inputs (the failure modes that surface in production re-runs, not demos)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from apachebeam_python_spark.operators import aggregations as agg
from apachebeam_python_spark.operators import dedup as D
from apachebeam_python_spark.operators import event_time as ET
from apachebeam_python_spark.operators import joins as J


def test_session_window_empty_input(spark):
    df = spark.createDataFrame([], "user_id long, ts timestamp")
    out = ET.session(df, "ts", "10 minutes", keys=["user_id"], n=F.count("*"))
    assert out.count() == 0


def test_asof_join_empty_right(spark):
    left = spark.createDataFrame([(1, dt.datetime(2024, 1, 1))], "k long, ts timestamp")
    right = spark.createDataFrame([], "k long, ts timestamp, v double")
    out = J.asof_join_union(left, right, ["k"], "ts", "ts", "v")
    rows = out.collect()
    assert len(rows) == 1 and rows[0].asof_value is None


def test_minhash_single_document(spark):
    df = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    out = D.minhash_lsh_pairs(df, "text", "doc_id")
    assert out.count() == 0  # no pairs from one doc, no crash


def test_minhash_identical_documents_found(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy dog"),
         (3, "completely different words appear in this one here")],
        "doc_id long, text string",
    )
    out = D.minhash_lsh_pairs(df, "text", "doc_id", threshold=0.9)
    rows = out.collect()
    assert [(r.doc_a, r.doc_b, r.jaccard) for r in rows] == [(1, 2, 1.0)]


def test_group_into_batches_batch_larger_than_group(spark):
    df = spark.createDataFrame([(1, 1), (1, 2)], "k long, v long")
    out = agg.group_into_batches(df, ["k"], "v", 100)
    assert [r.batch for r in out.collect()] == [[1, 2]]


def test_exact_dedup_all_unique(spark):
    df = spark.createDataFrame([(i, f"text {i}") for i in range(5)], "doc_id long, text string")
    out = D.exact_dedup_groups(df, "text", "doc_id")
    assert out.count() == 5
    assert out.agg(F.max("n_copies")).collect()[0][0] == 1


def test_shingles_short_document_no_crash(spark):
    """Docs with < n tokens must yield empty shingle arrays (ANSI mode would
    throw on the unguarded descending sequence) — and so must minhash."""
    from apachebeam_python_spark.functions import text as T

    df = spark.createDataFrame(
        [(1, "solo"), (2, ""), (3, "two words"), (4, "a b c")],
        "doc_id long, text string",
    )
    out = df.select("doc_id", T.shingles(F.col("text"), 2).alias("sh")).collect()
    got = {r.doc_id: list(r.sh) for r in out}
    assert got[1] == [] and got[2] == []
    assert got[3] == ["two words"]
    pairs = D.minhash_lsh_pairs(df, "text", "doc_id")
    assert pairs.count() == 0


def test_par_do_setup_returning_none(spark):
    """A setup() that returns None must still reach the two-arg DoFn form."""
    from apachebeam_python_spark.operators import elementwise as ew

    df = spark.createDataFrame([(1,), (2,)], "x long")

    def dofn(batches, state):
        assert state is None
        for pdf in batches:
            yield pdf

    out = ew.par_do(df, dofn, "x long", setup=lambda: None)
    assert {r.x for r in out.collect()} == {1, 2}


def test_cosine_zero_vector_no_crash(spark):
    """Zero-norm vectors must yield similarity 0.0, not an ANSI divide-by-
    zero that kills the job."""
    from apachebeam_python_spark.operators.similarity import cosine_topk

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 0.0]), (3, [0.5, 0.5])],
        "vec_id long, embedding array<float>",
    )
    out = cosine_topk(df, df, "embedding", "vec_id", k=2).collect()
    zero_rows = [r for r in out if r.neighbor_id == 2 or r.query_id == 2]
    assert zero_rows and all(r.cos_sim == 0.0 for r in zero_rows)


def test_cogroup_null_keys_merge(spark):
    """NULL keys form ONE CoGBK group (Beam semantics), not two one-sided rows."""
    left = spark.createDataFrame([(None, "x"), (1, "a")], "k int, v string")
    right = spark.createDataFrame([(None, "y"), (2, "b")], "k int, v string")
    out = J.cogroup_by_key(left, right, ["k"], "v", "v")
    rows = {(r.k, tuple(r.left_values), tuple(r.right_values)) for r in out.collect()}
    assert rows == {(None, ("x",), ("y",)), (1, ("a",), ()), (2, (), ("b",))}


def test_reshuffle_no_args(spark):
    from apachebeam_python_spark.operators.elementwise import reshuffle

    df = spark.createDataFrame([(1,), (2,)], "x long")
    assert reshuffle(df).count() == 2


def test_partition_into_out_of_range_raises(spark):
    import pytest as _pytest

    from apachebeam_python_spark.operators.elementwise import partition_into
    from pyspark.sql import functions as _F

    df = spark.createDataFrame([(7,)], "x long")
    parts = partition_into(df, _F.col("x"), 3)  # bucket 7 out of [0,3)
    with _pytest.raises(Exception, match="out of range"):
        parts[0].count()


def test_minhash_bands_validation(spark):
    import pytest as _pytest

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="bands"):
        D.minhash_lsh_pairs(df, "text", "doc_id", num_hashes=32, bands=64)
    with _pytest.raises(ValueError, match="bands"):
        D.minhash_lsh_pairs(df, "text", "doc_id", num_hashes=32, bands=7)


def test_salted_join_rejects_unsafe_how(spark):
    import pytest as _pytest

    from apachebeam_python_spark.operators import skew
    from pyspark.sql import functions as _F

    df = spark.createDataFrame([(1, 2)], "k long, v long")
    with _pytest.raises(ValueError, match="salt-safe"):
        skew.salted_join(df, df, "k", _F.col("v"), 4, how="full")


def test_minhash_finds_high_jaccard_pair(spark):
    """A handcrafted ~0.9-jaccard pair must surface through LSH banding
    (deterministic hashes → deterministic result)."""
    base = " ".join(f"w{i}" for i in range(40))
    near = " ".join(f"w{i}" for i in range(39)) + " zz"   # 38/41 shared bigrams
    far = " ".join(f"q{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "doc_id long, text string"
    )
    rows = {(r.doc_a, r.doc_b): r.jaccard for r in D.minhash_lsh_pairs(
        df, "text", "doc_id", threshold=0.5).collect()}
    assert (1, 2) in rows and rows[(1, 2)] > 0.8
    assert all(3 not in pair for pair in rows)


def test_convert_event_ts_both_fixture_encodings(spark):
    """The driver regenerates /root/testdata per round and has shipped
    events.ts as BOTH timestamp[ns] (read as long under nanosAsLong) and
    timestamp[us] (read as TIMESTAMP_NTZ on Spark 4). convert_event_ts must
    normalize either to TimestampType with identical wall-clock values."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import TimestampType

    from apachebeam_python_spark.session import convert_event_ts

    ns = 1_700_000_000_123_456_789  # 2023-11-14T22:13:20.123456789Z
    as_long = spark.createDataFrame([(ns,)], "ts long")
    out_long = convert_event_ts(as_long)
    assert isinstance(out_long.schema["ts"].dataType, TimestampType)

    as_ntz = spark.sql(
        "SELECT CAST('2023-11-14 22:13:20.123456' AS TIMESTAMP_NTZ) AS ts"
    )
    out_ntz = convert_event_ts(as_ntz)
    assert isinstance(out_ntz.schema["ts"].dataType, TimestampType)

    # same instant, µs precision, session tz UTC → identical strings
    a = out_long.select(F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS")).first()[0]
    b = out_ntz.select(F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS")).first()[0]
    assert a == b == "2023-11-14 22:13:20.123456"

    # already-TimestampType input passes through untouched
    assert convert_event_ts(out_ntz) is out_ntz
