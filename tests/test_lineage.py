"""Checkpoint/resume: lineage records, crash injection, idempotent rerun."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def out_dir(tmp_path):
    return str(tmp_path / "graph_out")


def _stage(spark, sf_dir, out_dir, n_chunks=4):
    from kgt.spark.lineage import stage_input
    from kgt.spark.transcripts import orders_transcripts

    tx = orders_transcripts(spark, sf_dir, with_errors=True)
    stage_input(tx, out_dir, n_chunks)
    return tx


def test_full_run_and_metrics(spark, sf_dir, out_dir):
    from kgt.spark.lineage import metrics, read_triples, run_extraction

    _stage(spark, sf_dir, out_dir)
    stats = run_extraction(spark, out_dir, "r1", n_chunks=4)
    assert stats["chunks_run"] == 4
    n_orders = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    assert read_triples(spark, out_dir).count() == 6 * n_orders
    m = metrics(spark, out_dir)
    assert m.count() == 4
    assert m.filter(F.col("status") == "done").count() == 4
    assert m.agg(F.sum("n_triples")).first()[0] == 6 * n_orders


def test_crash_resume_idempotent(spark, sf_dir, out_dir):
    from kgt.spark.lineage import (
        completed_chunks,
        metrics,
        read_triples,
        run_extraction,
    )

    _stage(spark, sf_dir, out_dir)
    # crash after chunk 2's outputs, before its lineage record
    # (batch_chunks=1: the strictly sequential fine-grained mode)
    with pytest.raises(RuntimeError, match="injected failure"):
        run_extraction(
            spark, out_dir, "r1", n_chunks=4, fail_on_chunk=2, batch_chunks=1
        )
    assert completed_chunks(spark, out_dir) == {0, 1, 2} - {2}
    # resume: chunks 2 and 3 rerun; chunk 2's outputs overwritten
    stats = run_extraction(spark, out_dir, "r2", n_chunks=4, batch_chunks=1)
    assert stats["chunks_run"] == 2
    n_orders = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    assert read_triples(spark, out_dir).count() == 6 * n_orders
    # no duplicate triples from the rerun (content-hash determinism)
    t = read_triples(spark, out_dir)
    assert t.count() == t.dropDuplicates(["conv_id", "stmt_idx"]).count()
    # lineage mixes both run_ids
    runs = {r["run_id"] for r in metrics(spark, out_dir).collect()}
    assert runs == {"r1", "r2"}


def test_batched_crash_resume(spark, sf_dir, out_dir):
    """Batched mode: one Spark job covers batch_chunks chunks; a crash
    mid-batch loses only that batch's lineage, and the resume rerun is
    idempotent (dynamic partition overwrite + content-hash skolems)."""
    from kgt.spark.lineage import (
        completed_chunks,
        read_triples,
        run_extraction,
    )

    _stage(spark, sf_dir, out_dir)
    # batch 1 = chunks {0,1} done; crash in batch 2 = {2,3}
    with pytest.raises(RuntimeError, match="injected failure"):
        run_extraction(
            spark, out_dir, "r1", n_chunks=4, fail_on_chunk=3, batch_chunks=2
        )
    assert completed_chunks(spark, out_dir) == {0, 1}
    stats = run_extraction(spark, out_dir, "r2", n_chunks=4, batch_chunks=2)
    assert stats["chunks_run"] == 2
    n_orders = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    t = read_triples(spark, out_dir)
    assert t.count() == 6 * n_orders
    assert t.count() == t.dropDuplicates(["conv_id", "stmt_idx"]).count()


def test_batched_matches_sequential(spark, sf_dir, out_dir, tmp_path):
    """Same triples whether chunks run one-by-one or batched."""
    from kgt.spark.lineage import read_triples, run_extraction, stage_input
    from kgt.spark.transcripts import orders_transcripts

    tx = orders_transcripts(spark, sf_dir, with_errors=True)
    other = str(tmp_path / "seq_out")
    stage_input(tx, out_dir, 4)
    stage_input(tx, other, 4)
    run_extraction(spark, out_dir, "rb", n_chunks=4, batch_chunks=4)
    run_extraction(spark, other, "rs", n_chunks=4, batch_chunks=1)
    a = {
        tuple(r)
        for r in read_triples(spark, out_dir)
        .select("conv_id", "stmt_idx", "subj", "pred", "obj")
        .collect()
    }
    b = {
        tuple(r)
        for r in read_triples(spark, other)
        .select("conv_id", "stmt_idx", "subj", "pred", "obj")
        .collect()
    }
    assert a == b


def test_empty_output_chunks_still_materialize(spark, out_dir):
    """A chunk whose batch produces ZERO triples (all-bad docs) must
    still (a) materialize a schema-bearing triples/chunk=K dir so
    read_triples works, and (b) clear stale rows left by an aborted
    earlier attempt under that chunk."""
    from kgt.spark.lineage import read_triples, run_extraction, stage_input

    # every doc is unparseable → 0 triples, 1+ error row per conv
    tx = spark.createDataFrame(
        [(f"c{i}", 0, "user", "@@ not turtle @@", None, None) for i in range(8)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    stage_input(tx, out_dir, 4)
    # simulate an aborted earlier attempt: stale triples under chunk=0
    stale = spark.createDataFrame(
        [("zz", 0, "<s>", "<p>", "<o>", False)],
        "conv_id string, stmt_idx long, subj string, pred string, "
        "obj string, is_quoted boolean",
    )
    stale.write.mode("overwrite").parquet(f"{out_dir}/triples/chunk=0")
    stats = run_extraction(spark, out_dir, "r1", n_chunks=4)
    assert stats["chunks_run"] == 4
    t = read_triples(spark, out_dir)  # must not fail on missing schema
    assert t.count() == 0  # stale chunk=0 rows cleared too
    errs = spark.read.parquet(f"{out_dir}/errors")
    assert errs.count() >= 8


def test_iceberg_branch_requires_jars(spark, sf_dir):
    """The iceberg: sink raises a documented capability error in
    jar-less environments instead of a late classloader failure."""
    from kgt.spark.write import materialize_triples

    t = spark.createDataFrame(
        [("c1", 0, "<s>", "<p>", "<o>", False)],
        "conv_id string, stmt_idx long, subj string, pred string, "
        "obj string, is_quoted boolean",
    )
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        materialize_triples(t, "iceberg:local.db.graph")


def test_iceberg_gate_accepts_catalog_only_config(spark):
    """A cluster configured with just an Iceberg catalog (no SQL
    extensions) must pass the capability gate — DataFrameWriterV2 only
    needs the catalog. Exercised against stub sessions so the check's
    two signals are pinned independently of this sandbox's conf."""
    from kgt.spark.write import _iceberg_configured

    class _Conf:
        def __init__(self, extensions):
            self._e = extensions

        def get(self, key, default=None):
            return self._e if key == "spark.sql.extensions" else default

    class _SC:
        def __init__(self, pairs):
            self._p = pairs

        def getConf(self):
            sc = self

            class _G:
                def getAll(self_inner):
                    return sc._p

            return _G()

    class _Spark:
        def __init__(self, extensions, pairs):
            self.conf = _Conf(extensions)
            self.sparkContext = _SC(pairs)

    cat = [("spark.sql.catalog.ice", "org.apache.iceberg.spark.SparkCatalog")]
    assert _iceberg_configured(_Spark("", cat))
    assert _iceberg_configured(
        _Spark(
            "org.apache.iceberg.spark.extensions."
            "IcebergSparkSessionExtensions",
            [],
        )
    )
    assert not _iceberg_configured(_Spark("", [("spark.master", "local")]))
    # the real sandbox session has neither signal
    assert not _iceberg_configured(spark)


def test_build_graph_link_stage(spark, sf_dir, tmp_path):
    """End-to-end north-rule run via the production entry point with
    the entity-linking stage on: parse triples AND <urn:kg:mentions>
    provenance triples land in the materialized graph."""
    from jobs.build_graph import main
    from pyspark.sql import functions as F

    out = str(tmp_path / "graph_link")
    main(
        [
            "--input", sf_dir,
            "--synthetic-orders",
            "--output", out,
            "--chunks", "2",
            "--cpus", "4",
            "--link",
        ],
        stop_session=False,  # the pytest session owns the SparkSession
    )
    g = spark.read.parquet(f"{out}/graph")
    n_orders = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    parse_rows = g.filter(F.col("pred") != "<urn:kg:mentions>").count()
    mention_rows = g.filter(F.col("pred") == "<urn:kg:mentions>").count()
    assert parse_rows == 6 * n_orders
    # every conversation mentions all 4 dictionary entities
    assert mention_rows >= 4 * n_orders
    assert (
        g.filter(F.col("pred") == "<urn:kg:mentions>")
        .select("obj").distinct().count()
        == 4
    )


def test_materialize_bucketed(spark, sf_dir, out_dir, tmp_path):
    from kgt.spark.lineage import read_triples, run_extraction
    from kgt.spark.write import materialize_triples

    _stage(spark, sf_dir, out_dir)
    run_extraction(spark, out_dir, "r1", n_chunks=4)
    gpath = str(tmp_path / "graph")
    materialize_triples(read_triples(spark, out_dir), gpath, n_buckets=8)
    g = spark.read.parquet(gpath)
    n_orders = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    assert g.count() == 6 * n_orders
    assert "subj_bucket" in g.columns
    # same subject always lands in the same bucket
    assert (
        g.groupBy("subj")
        .agg(F.countDistinct("subj_bucket").alias("nb"))
        .filter(F.col("nb") > 1)
        .count()
        == 0
    )


def test_resume_rejects_chunk_fanout_mismatch(spark, sf_dir, tmp_path):
    """Round-6 review find: resuming with a different --chunks than
    staging silently dropped staged chunks >= n_chunks; the staging
    fan-out is now recorded and validated."""
    import pytest as _pytest

    from kgt.spark.lineage import run_extraction, stage_input
    from kgt.spark.transcripts import orders_transcripts

    out = str(tmp_path / "mismatch_run")
    stage_input(
        orders_transcripts(spark, sf_dir).limit(40), out, n_chunks=4
    )
    with _pytest.raises(ValueError, match="n_chunks=4"):
        run_extraction(spark, out, "r1", n_chunks=8)
    # the matching fan-out still runs
    stats = run_extraction(spark, out, "r1", n_chunks=4)
    assert stats["chunks_run"] == 4
