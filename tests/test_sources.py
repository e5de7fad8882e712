"""sources/: auth S3A mapping, downloader estimators, SQL-library
partitioner (references auth.py / data_downloader.py /
data_partitioner.py)."""

from __future__ import annotations

import os

import pytest

from de_polars_spark.sources.auth import s3a_options_from_credentials
from de_polars_spark.sources.downloader import (
    DataDownloader,
    estimate_download_time,
    estimate_from_sample_sizes,
    estimate_query_cost_savings,
)
from de_polars_spark.sources.partitioner import (
    DataPartitioner,
    extract_query_metadata,
)


class TestAuth:
    def test_s3a_mapping(self):
        opts = s3a_options_from_credentials(
            {"access_key": "AK", "secret_key": "SK", "token": "TK",
             "region": "eu-west-1"}
        )
        assert opts["spark.hadoop.fs.s3a.access.key"] == "AK"
        assert opts["spark.hadoop.fs.s3a.secret.key"] == "SK"
        assert opts["spark.hadoop.fs.s3a.session.token"] == "TK"
        assert "TemporaryAWSCredentialsProvider" in opts[
            "spark.hadoop.fs.s3a.aws.credentials.provider"
        ]
        assert opts["spark.hadoop.fs.s3a.endpoint.region"] == "eu-west-1"
        # static keys -> no temporary provider forced
        static = s3a_options_from_credentials({"access_key": "AK", "secret_key": "SK"})
        assert "spark.hadoop.fs.s3a.aws.credentials.provider" not in static
        assert s3a_options_from_credentials({}) == {}


class TestDownloaderEstimators:
    def test_download_time_tiers(self):
        # 10 MB/s assumed throughput (reference constant)
        assert estimate_download_time(100) == "10 seconds"
        assert estimate_download_time(6000) == "10 minutes"
        assert estimate_download_time(400000) == "11 hours"

    def test_cost_savings(self):
        # $5/TB x 20 queries/month
        assert estimate_query_cost_savings(1024 * 1024) == 100.0
        assert estimate_query_cost_savings(0) == 0.0

    def test_sample_extrapolation(self):
        out = estimate_from_sample_sizes([1024 * 1024] * 10, total_files=100)
        assert out["total_files"] == 100
        assert out["total_size_mb"] == 100.0  # 10 sampled 1MB files -> 100 files
        empty = estimate_from_sample_sizes([], total_files=0)
        assert empty["estimated_download_time"] == "N/A"

    def test_requires_buckets(self):
        from de_polars_spark.config import DataConfig

        with pytest.raises(ValueError):
            DataDownloader(DataConfig(local_data_path="/tmp/x"))

    def test_local_status(self, tmp_path):
        from de_polars_spark.config import DataConfig

        cfg = DataConfig(s3_bucket="b", local_data_path=str(tmp_path))
        dl = DataDownloader(cfg)
        assert dl.check_local_data_status()["has_local_data"] is False
        (tmp_path / "part-000.parquet").write_bytes(b"x" * 2048)
        status = dl.check_local_data_status()
        assert status["has_local_data"] and status["file_count"] == 1


class TestPartitioner:
    @pytest.fixture()
    def library(self, tmp_path):
        lib = tmp_path / "lib"
        (lib / "analytics").mkdir(parents=True)
        (lib / "analytics" / "by_region.sql").write_text(
            "-- Description: spend by region\n"
            "-- Partitioning: region\n"
            "SELECT product_region AS region,\n"
            "       SUM(line_item_unblended_cost) AS spend\n"
            "FROM cur_ext GROUP BY 1\n"
        )
        (lib / "top.sql").write_text(
            "-- Description: top accounts\n"
            "SELECT line_item_usage_account_id, COUNT(*) AS n\n"
            "FROM cur_ext GROUP BY 1 ORDER BY n DESC LIMIT 3\n"
        )
        (lib / "bad.sql").write_text("SELECT * FROM table_that_is_not_there")
        return lib

    @pytest.fixture()
    def partitioner(self, spark, sf_dir, tmp_path, library):
        from de_polars_spark.engine.core import SparkEngine
        from de_polars_spark.inventory.kpi_views import _ensure_cur_ext

        _ensure_cur_ext(spark, sf_dir)
        return DataPartitioner(
            SparkEngine(spark),
            output_base_dir=str(tmp_path / "out"),
            query_library_path=str(library),
        )

    def test_metadata_extraction(self):
        meta = extract_query_metadata(
            "-- Description: d\n-- Partitioning: a, b\n-- Output: o\nSELECT 1"
        )
        assert meta == {"description": "d", "partitioning": "a, b", "output": "o"}

    def test_discovery_and_listing(self, partitioner):
        cats = partitioner.discover_sql_files()
        assert set(cats) == {".", "analytics"}
        listing = partitioner.list_available_sql_files()
        names = {e["table_name"] for e in listing}
        assert names == {"by_region", "top", "bad"}
        by_region = next(e for e in listing if e["table_name"] == "by_region")
        assert by_region["description"] == "spend by region"

    def test_run_sql_file_partitioned(self, spark, partitioner):
        out = partitioner.run_sql_file(os.path.join("analytics", "by_region.sql"))
        # hive layout from the "-- Partitioning: region" header
        assert any(d.startswith("region=") for d in os.listdir(out))
        back = spark.read.parquet(out)
        assert back.count() == 3 and set(back.columns) == {"spend", "region"}

    def test_run_sql_files_batch(self, spark, partitioner):
        results = partitioner.run_sql_files([
            "top.sql", os.path.join("analytics", "by_region.sql"), "bad.sql",
        ])
        assert results["top.sql"].endswith("top.parquet")
        assert spark.read.parquet(results["top.sql"]).count() == 3
        assert results["bad.sql"].startswith("ERROR:")


def test_jsonl_roundtrip_adversarial_strings(spark, tmp_path):
    from de_polars_spark.sources import jsonl as JS

    rows = [
        (1, 'quote " and \\ backslash', "en"),
        (2, "newline\nand\ttab", "de"),
        (3, "unicode — 世界 🚀 ü", "fr"),
        (4, "", "en"),
        (5, None, "xx"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    path = str(tmp_path / "docs_jsonl")
    JS.write_jsonl(df, path)
    back = JS.read_jsonl(spark, path, "doc_id bigint, text string, lang string")
    got = sorted(map(tuple, back.collect()))
    # Spark's JSON writer DROPS null fields from the line; the explicit
    # schema reads them back as NULL — lossless for our purposes
    assert got == sorted(rows)


def test_jsonl_failfast_on_malformed_line(spark, tmp_path):
    import pytest as _pytest

    from de_polars_spark.sources import jsonl as JS

    p = tmp_path / "bad"
    p.mkdir()
    (p / "part-00000.json").write_text(
        '{"doc_id": 1, "text": "ok"}\n{not json at all\n'
    )
    with _pytest.raises(Exception, match="Malformed|FAILFAST|corrupt"):
        JS.read_jsonl(spark, str(p), "doc_id bigint, text string").collect()
    # PERMISSIVE mode instead quarantines: good rows survive
    ok = JS.read_jsonl(
        spark, str(p), "doc_id bigint, text string", mode="PERMISSIVE"
    )
    assert ok.where("doc_id = 1").count() == 1


def test_jsonl_gzip_reads_transparently(spark, tmp_path):
    # .jsonl.gz is how corpora actually arrive; Spark decompresses by
    # extension. The SCALE caveat (documented in sources/jsonl.py): a
    # gzip member is NOT byte-range splittable — one reader per file —
    # so huge corpora must ship as MANY gz files, not one.
    import gzip

    from de_polars_spark.sources import jsonl as JS

    p = tmp_path / "gz"
    p.mkdir()
    with gzip.open(p / "part-00000.jsonl.gz", "wt") as fh:
        fh.write('{"doc_id": 1, "text": "alpha"}\n{"doc_id": 2, "text": "bêta"}\n')
    with gzip.open(p / "part-00001.jsonl.gz", "wt") as fh:
        fh.write('{"doc_id": 3, "text": "γάμμα"}\n')
    back = JS.read_jsonl(spark, str(p), "doc_id bigint, text string")
    assert sorted(map(tuple, back.collect())) == [
        (1, "alpha"), (2, "bêta"), (3, "γάμμα"),
    ]


def test_sf1_generator_schema_parity(tmp_path):
    """tools/gen_testdata.py must emit arrow schemas IDENTICAL to the
    driver's testdata (column names, int widths, float32 embedding
    lists, timestamp[us]) — the sf1 bench artifact is only comparable
    if the shapes match exactly."""
    import importlib.util
    import os

    import pyarrow.parquet as pq

    spec = importlib.util.spec_from_file_location(
        "gen_testdata",
        os.path.join(os.path.dirname(__file__), "..", "tools", "gen_testdata.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = str(tmp_path / "tiny")
    mod.main(["--out", out, "--scale", "0.0005"])
    src = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        want = pq.read_schema(os.path.join(src, f"{t}.parquet"))
        got = pq.read_schema(os.path.join(out, f"{t}.parquet"))
        assert got.equals(want, check_metadata=False), (
            f"{t}: generated schema {got} != driver schema {want}"
        )
