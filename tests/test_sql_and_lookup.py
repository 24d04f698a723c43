"""Round-4 surfaces: pure-Python XXH64 twin, batched point lookups, the
SQL view layer, and multi-table consistent reads."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from hierarchical_to_relational_spark.functions.xxh64 import (
    bucket_of_key,
    xxh64_signed,
)
from hierarchical_to_relational_spark.operators.merge import (
    lookup_conversation,
    lookup_conversations,
    read_transcripts,
)
from hierarchical_to_relational_spark.streaming.driver import CdcPipeline
from tests.test_cdc import _env_rows

_SPARK = {}


def _xxhash64_oracle(spark, strings):
    df = spark.createDataFrame([(s,) for s in strings], "s string")
    return {r["s"]: (r["h"], r["b"]) for r in df.select(
        "s", F.xxhash64("s").alias("h"),
        F.pmod(F.xxhash64("s"), F.lit(32)).cast("int").alias("b")).collect()}


@settings(max_examples=30, deadline=None)
@given(st.lists(st.text(min_size=0, max_size=120), min_size=1, max_size=8, unique=True))
def test_xxh64_matches_spark(s):
    """Property: the driver-side XXH64 twin is bit-equal to Spark's
    xxhash64 (and the derived bucket equals pmod(xxhash64, n)) over
    arbitrary unicode strings — the exactness batched lookups rely on."""
    spark = _SPARK["s"]
    # surrogates can't round-trip through UTF-8; Spark would reject them too
    s = [x.encode("utf-8", "replace").decode("utf-8") for x in s]
    want = _xxhash64_oracle(spark, s)
    for v in set(s):
        h, b = want[v]
        assert xxh64_signed(v.encode("utf-8")) == h
        assert bucket_of_key(v, 32) == b


@pytest.fixture(autouse=True)
def _stash_spark(spark):
    _SPARK["s"] = spark
    yield


@pytest.fixture()
def table3(spark, tmp_path):
    pipe = CdcPipeline(spark, str(tmp_path / "bl"), str(tmp_path / "t"),
                       str(tmp_path / "ck"), n_buckets=8, text_mode="none")
    pipe.apply_batch(_env_rows(spark, [
        (1, "insert", "cA", [(0, "user", "a0", None), (1, "assistant", "a1", None)]),
        (2, "insert", "cB", [(0, "user", "b0", None)]),
        (3, "insert", "cC", [(0, "user", "c0", None)]),
    ]), "b0")
    pipe.apply_batch(_env_rows(spark, [
        (4, "update", "cA", [(1, "assistant", "a1-v2", None)]),
        (5, "delete", "cC", None),
    ]), "b1")
    return pipe


def test_batched_lookup(spark, table3):
    """lookup_conversations returns the same rows as per-key lookups, in
    one plan, with NO Spark job spent on bucket hashing; single-key
    lookup_conversation now routes through the same path."""
    t = table3.table
    batched = {(r["conv_id"], r["turn_idx"], r["text"])
               for r in lookup_conversations(spark, t, ["cA", "cB", "cC"]).collect()}
    assert batched == {("cA", 0, "a0"), ("cA", 1, "a1-v2"), ("cB", 0, "b0")}
    single = {(r["conv_id"], r["turn_idx"], r["text"])
              for r in lookup_conversation(spark, t, "cA").collect()}
    assert single == {("cA", 0, "a0"), ("cA", 1, "a1-v2")}
    with pytest.raises(ValueError):
        lookup_conversations(spark, t, [])


def test_sql_views(spark, table3):
    """A SQL-only user queries the table, raw state, history, and the CDC
    diff purely via spark.sql — and views stay snapshot-pinned until
    refreshed."""
    from hierarchical_to_relational_spark import sql as hsql

    t = table3.table
    reg = hsql.register_views(spark, t, prefix="tx")
    assert set(reg["views"]) == {"tx", "tx_raw", "tx_history"}
    live = {(r["conv_id"], r["turn_idx"], r["text"]) for r in
            spark.sql("SELECT conv_id, turn_idx, text FROM tx").collect()}
    assert live == {("cA", 0, "a0"), ("cA", 1, "a1-v2"), ("cB", 0, "b0")}
    # raw view exposes metadata incl. the cC tombstone
    assert spark.sql("SELECT count(*) n FROM tx_raw WHERE _op = 'd'").first()["n"] == 1
    assert spark.sql("SELECT max(version) v FROM tx_history").first()["v"] == t.current_version()

    # changes view: SQL over the incremental diff
    hsql.register_changes_view(spark, t, since_version=1, prefix="tx")
    ops = {r["change_op"]: r["n"] for r in spark.sql(
        "SELECT change_op, count(*) n FROM tx_changes GROUP BY change_op").collect()}
    assert ops.get("d") == 1 and ops.get("u", 0) >= 1
    with pytest.raises(ValueError):
        hsql.register_changes_view(spark, t)

    # pinned semantics: a commit after registration is invisible until refresh
    table3.apply_batch(_env_rows(spark, [
        (6, "insert", "cD", [(0, "user", "d0", None)]),
    ]), "b2")
    assert spark.sql("SELECT count(*) n FROM tx WHERE conv_id='cD'").first()["n"] == 0
    hsql.refresh(spark, t, prefix="tx")
    assert spark.sql("SELECT count(*) n FROM tx WHERE conv_id='cD'").first()["n"] == 1


def test_consistent_cut(spark, tmp_path):
    """pin_consistent_versions retries past a torn first pass (a commit
    landing mid-pin) and consistent_reads serves both tables from the
    accepted vector; an explicit saved cut reproduces the old state."""
    from hierarchical_to_relational_spark.table.consistent import (
        consistent_reads,
        pin_consistent_versions,
    )

    pipes = {}
    for name in ("fact", "dim"):
        pipes[name] = CdcPipeline(spark, str(tmp_path / f"bl-{name}"),
                                  str(tmp_path / name), str(tmp_path / f"ck-{name}"),
                                  n_buckets=2, text_mode="none")
        pipes[name].apply_batch(_env_rows(spark, [
            (1, "insert", f"{name}-k1", [(0, "user", f"{name}-v1", None)]),
        ]), "b0")
    tables = {n: p.table for n, p in pipes.items()}
    cut1 = pin_consistent_versions(tables)

    # torn pin: the first pass sees dim BEFORE a commit that lands mid-pin
    real = type(tables["dim"]).current_version
    fired = {"n": 0}

    def racing(self):
        v = real(self)
        if self is tables["dim"] and fired["n"] == 0:
            fired["n"] += 1
            pipes["dim"].apply_batch(_env_rows(spark, [
                (2, "insert", "dim-k2", [(0, "user", "dim-v2", None)]),
            ]), "b1")
        return v

    import hierarchical_to_relational_spark.table.snapshot_table as stmod
    orig = stmod.SnapshotTable.current_version
    stmod.SnapshotTable.current_version = racing
    try:
        cut2 = pin_consistent_versions(tables)
    finally:
        stmod.SnapshotTable.current_version = orig
    assert cut2["dim"] > cut1["dim"], "retry adopted the post-commit version"

    dfs = consistent_reads(spark, tables, versions=cut2)
    assert {r["conv_id"] for r in dfs["dim"].collect()} == {"dim-k1", "dim-k2"}
    # the SAVED pre-commit cut still reproduces the old dim state
    old = consistent_reads(spark, tables, versions=cut1)
    assert {r["conv_id"] for r in old["dim"].collect()} == {"dim-k1"}
    assert {r["conv_id"] for r in old["fact"].collect()} == {"fact-k1"}


def test_global_views_visible_to_fresh_session(spark, tmp_path):
    """Round-5 SQL catalog persistence: scope='global' registers
    global_temp views that a SECOND SparkSession of the same application
    (spark.newSession() — the same isolation a Connect/JDBC session gets)
    can query with pure SQL, no Python; session-scoped views stay
    invisible to it."""
    from hierarchical_to_relational_spark import sql as h2r_sql

    pipe = CdcPipeline(spark, str(tmp_path / "bl"), str(tmp_path / "t"),
                       str(tmp_path / "ck"), n_buckets=2, text_mode="none")
    pipe.apply_batch(_env_rows(spark, [
        (1, "insert", "cA", [(0, "user", "hello", None)]),
        (2, "insert", "cB", [(0, "user", "world", None)]),
    ]), "b0")

    out = h2r_sql.register_views(spark, pipe.table, prefix="gt_tr", scope="global")
    assert out["views"][0] == "global_temp.gt_tr"
    h2r_sql.register_views(spark, pipe.table, prefix="sess_tr")  # session-only

    s2 = spark.newSession()
    rows = s2.sql(
        "SELECT conv_id, text FROM global_temp.gt_tr ORDER BY conv_id").collect()
    assert [(r[0], r[1]) for r in rows] == [("cA", "hello"), ("cB", "world")]
    assert s2.sql("SELECT count(*) FROM global_temp.gt_tr_history").first()[0] >= 1
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException):
        s2.sql("SELECT * FROM sess_tr").collect()
    with pytest.raises(ValueError, match="scope"):
        h2r_sql.register_views(spark, pipe.table, scope="cluster")


def test_export_snapshot_cross_application(spark, tmp_path, table3):
    """export_snapshot: an immutable, snapshot-pinned parquet copy + the
    one-line DDL attaching it to any Spark SQL catalog. The registered
    external table is visible to a fresh session with zero Python, later
    table commits do NOT leak into the export, and DuckDB (a non-Spark
    parquet reader standing in for 'any other engine') reads the same
    rows."""
    from hierarchical_to_relational_spark import sql as h2r_sql
    from hierarchical_to_relational_spark.operators.merge import read_transcripts

    t = table3.table
    path = str(tmp_path / "export")
    out = h2r_sql.export_snapshot(spark, t, path, table_name="tx_export_t")
    try:
        assert out["registered"] and "USING parquet LOCATION" in out["ddl"]
        want = sorted((r["conv_id"], r["turn_idx"], r["text"]) for r in
                      read_transcripts(spark, t, version=out["version"]).collect())

        s2 = spark.newSession()  # catalog table: visible cross-session, pure SQL
        got = sorted(tuple(r) for r in s2.sql(
            "SELECT conv_id, turn_idx, text FROM tx_export_t").collect())
        assert got == want

        # pinned: a post-export commit must not appear in the export
        table3.apply_batch(_env_rows(spark, [
            (9, "insert", "cZ", [(0, "user", "late", None)]),
        ]), "late")
        again = sorted(tuple(r) for r in s2.sql(
            "SELECT conv_id, turn_idx, text FROM tx_export_t").collect())
        assert again == want

        # any parquet engine reads it: DuckDB over the exported files
        import duckdb, os
        con = duckdb.connect()
        dd = sorted(tuple(r) for r in con.execute(
            f"SELECT conv_id, turn_idx, text FROM read_parquet('{os.path.join(path, 'data', '*.parquet')}')"
        ).fetchall())
        assert dd == want

        # refusal without overwrite; atomic replace with it (new version)
        with pytest.raises(FileExistsError):
            h2r_sql.export_snapshot(spark, t, path)
        out2 = h2r_sql.export_snapshot(spark, t, path, table_name="tx_export_t",
                                       overwrite=True)
        assert out2["version"] > out["version"]
        got2 = sorted(tuple(r) for r in spark.newSession().sql(
            "SELECT conv_id, turn_idx, text FROM tx_export_t").collect())
        assert ("cZ", 0, "late") in got2
    finally:
        spark.sql("DROP TABLE IF EXISTS tx_export_t")
