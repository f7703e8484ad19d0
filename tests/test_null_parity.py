"""Injected-NULL fixture parity (VERDICT r3 #2).

The stock testdata happens to contain no NULL ``events.value`` /
``documents.lang`` / ``documents.source``, so the NULL-semantics agreements
in q_pardo_tagged (predicate negation: NULLs land in the 'small' branch in
BOTH engines) and q_fn_map (coalesce before concat in BOTH engines) were
exercised only by inspection. A fixture regen with NULLs would have turned
a latent disagreement straight into a red driver row. Here we rewrite the
two tables WITH NULLs into a temp fixture dir and run the real driver
queries against their real oracles over that data — the agreement is now
observed, not argued.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from apachebeam_python_spark import queries as q

from .parity import assert_parity

SRC = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def null_fixture(tmp_path_factory):
    """Temp fixture dir: events with NULL value (every 7th event), documents
    with NULL lang (every 5th doc) and NULL source (every 3rd doc)."""
    d = tmp_path_factory.mktemp("nullsf")
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (SELECT * REPLACE (CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS value)
              FROM read_parquet('{SRC}/events.parquet'))
        TO '{d}/events.parquet' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (SELECT * REPLACE (
                CASE WHEN doc_id % 5 = 0 THEN NULL ELSE lang END AS lang,
                CASE WHEN doc_id % 3 = 0 THEN NULL ELSE source END AS source)
              FROM read_parquet('{SRC}/documents.parquet'))
        TO '{d}/documents.parquet' (FORMAT PARQUET)
        """
    )
    con.close()
    return str(d)


@pytest.fixture(scope="module")
def null_ddb(null_fixture):
    con = duckdb.connect()
    for name in ("events", "documents"):
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{null_fixture}/{name}.parquet')"
        )
    yield con
    con.close()


def test_pardo_tagged_null_values_agree(spark, null_fixture, null_ddb):
    """NULL value rows must land in the 'small' count in BOTH engines: Spark
    via the ``otherwise`` catch-all, DuckDB via the explicit
    ``value IS NULL OR value < 50`` — and the injected fixture actually has
    NULLs, so a regression here is a hash mismatch, not a no-op."""
    n_null = null_ddb.execute("SELECT count(*) FROM events WHERE value IS NULL").fetchone()[0]
    assert n_null > 0, "fixture injection failed"
    df = q.QUERIES["q_pardo_tagged"](spark, null_fixture)
    assert_parity(df, null_ddb, q.ORACLES["q_pardo_tagged"], name="q_pardo_tagged[nulls]")


def test_fn_map_null_lang_source_agree(spark, null_fixture, null_ddb):
    """concat_ws skips NULLs while DuckDB ``||`` propagates them — both
    sides coalesce to '' so the composed meta strings stay identical under
    real NULL lang/source rows."""
    n_null = null_ddb.execute(
        "SELECT count(*) FROM documents WHERE lang IS NULL OR source IS NULL"
    ).fetchone()[0]
    assert n_null > 0, "fixture injection failed"
    df = q.QUERIES["q_fn_map"](spark, null_fixture)
    assert_parity(df, null_ddb, q.ORACLES["q_fn_map"], name="q_fn_map[nulls]")


def test_kmeans_rows_below_k_raises(spark):
    """VERDICT r3 #2 tail: kmeans_centroids with fewer rows than k must
    raise the explicit ValueError, not an opaque IndexError."""
    from apachebeam_python_spark.operators import clustering as C

    df = spark.createDataFrame(
        [(1, [0.0, 1.0]), (2, [1.0, 0.0])], "id long, v array<double>"
    )
    with pytest.raises(ValueError, match="k-means needs"):
        C.kmeans_centroids(df, "v", "id", k=5, n_iter=1)
