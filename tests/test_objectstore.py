"""Object-store surface: scheme-qualified URIs flow through the
landing-zone sweep unchanged (the Hadoop FS API resolves the
filesystem from the scheme, so ``s3a://`` is the same code path as
``file://``), and the S3A conf assembly stays pure config -- no
network calls, assertable key-for-key."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from dataingestionengineprocess_spark.objectstore import (
    KNOWN_SCHEMES,
    s3a_confs,
    validate_store_uri,
    warehouse_unload_confs,
)
from dataingestionengineprocess_spark.pipeline import (
    FeedConfig,
    SinkConfig,
    ingest_new_files,
)

SCHEMA = T.StructType([
    T.StructField("order_id", T.LongType()),
    T.StructField("cust", T.StringType()),
    T.StructField("amount", T.DoubleType()),
    T.StructField("updated_at", T.TimestampType()),
])

CSV = """order_id,cust,amount,updated_at
1,alice,10.5,2024-01-01 10:00:00
2,bob,20.0,2024-01-01 11:00:00
"""


def test_ingest_new_files_accepts_file_scheme_uri(spark, tmp_path):
    # The landing dir arrives as a file:// URI -- the same
    # scheme-resolution path an s3a:// prefix takes. The sweep must
    # list, ingest, and ledger-skip identically to a plain path.
    landing = tmp_path / "landing"
    landing.mkdir()
    (landing / "drop1.csv").write_text(CSV)
    feed = FeedConfig(name="uri_feed", schema=SCHEMA,
                      key_cols=["order_id"], order_col="updated_at")
    sinks = SinkConfig(warehouse_dir=str(tmp_path / "wh"),
                       oltp_dir=str(tmp_path / "oltp"))
    uri = validate_store_uri(f"file://{landing}")

    s1 = ingest_new_files(spark, feed, uri, sinks)
    assert s1 is not None and s1.rows_loaded == 2
    # second sweep: ledger remembers the file's (path, size, mtime)
    # identity under its URI form -- nothing new
    assert ingest_new_files(spark, feed, uri, sinks) is None
    # a new drop under the same URI root is picked up
    (landing / "drop2.csv").write_text(CSV.replace("1,alice", "3,carol"))
    s2 = ingest_new_files(spark, feed, uri, sinks)
    assert s2 is not None and s2.rows_loaded == 2


def test_s3a_confs_magic_committer_keys():
    confs = s3a_confs()
    # zero-rename commit wiring: both Spark keys plus the committer
    # name and the magic enable flag
    assert confs["spark.hadoop.fs.s3a.committer.name"] == "magic"
    assert confs["spark.hadoop.fs.s3a.committer.magic.enabled"] == "true"
    assert confs["spark.sql.sources.commitProtocolClass"].endswith(
        "PathOutputCommitProtocol")
    assert confs["spark.sql.parquet.output.committer.class"].endswith(
        "BindingParquetOutputCommitter")
    # no credential material is ever assembled here
    assert not any("secret" in k.lower() or "access.key" in k
                   for k in confs)


def test_s3a_confs_minio_topology():
    confs = s3a_confs(endpoint="http://localhost:9000",
                      path_style_access=True, committer="directory",
                      anonymous=True)
    assert confs["spark.hadoop.fs.s3a.endpoint"] == "http://localhost:9000"
    assert confs["spark.hadoop.fs.s3a.path.style.access"] == "true"
    assert confs["spark.hadoop.fs.s3a.committer.name"] == "directory"
    assert "spark.hadoop.fs.s3a.committer.magic.enabled" not in confs
    assert confs["spark.hadoop.fs.s3a.aws.credentials.provider"].endswith(
        "AnonymousAWSCredentialsProvider")
    # only the public committer names are accepted ("staging" is the
    # internal base class, not a documented name)
    with pytest.raises(ValueError, match="unknown S3A committer"):
        s3a_confs(committer="staging")


def test_validate_store_uri_rules():
    assert validate_store_uri("/plain/local/path") == "/plain/local/path"
    assert validate_store_uri("s3a://bucket/landing") == "s3a://bucket/landing"
    # authority-less hdfs is VALID (namenode resolves from fs.defaultFS)
    assert validate_store_uri("hdfs:///warehouse") == "hdfs:///warehouse"
    assert "file" in KNOWN_SCHEMES and "s3a" in KNOWN_SCHEMES
    with pytest.raises(ValueError, match="unknown filesystem scheme"):
        validate_store_uri("ftp://host/x")
    with pytest.raises(ValueError, match="bucket/authority"):
        validate_store_uri("s3a:///no-bucket")


def test_unload_confs_bound_file_sizes():
    confs = warehouse_unload_confs()
    assert int(confs["spark.sql.files.maxRecordsPerFile"]) > 0
