"""Executes the boto3-coupled code paths without network.

Round-2 review flagged that Boto3PricingBackend, the S3 downloader, and
the STS assume-role chain were unit-tested with hand stubs only — the
actual boto3 call shapes never ran. Here moto serves S3/STS in-process,
and botocore's Stubber (which validates request params AND response
shapes against the real service models) covers the Pricing /
savingsplans / EC2 APIs moto doesn't model. No network, real clients.
"""

from __future__ import annotations

import json
import os

import pytest

boto3 = pytest.importorskip("boto3")
moto = pytest.importorskip("moto")

from botocore.stub import Stubber  # noqa: E402

from de_polars_spark.config import DataConfig  # noqa: E402

BUCKET = "test-cur-bucket"
PREFIX = "cur/monthly"


@pytest.fixture(autouse=True)
def _fake_aws_env(monkeypatch):
    monkeypatch.setenv("AWS_ACCESS_KEY_ID", "testing")
    monkeypatch.setenv("AWS_SECRET_ACCESS_KEY", "testing")
    monkeypatch.setenv("AWS_SECURITY_TOKEN", "testing")
    monkeypatch.setenv("AWS_SESSION_TOKEN", "testing")
    monkeypatch.setenv("AWS_DEFAULT_REGION", "us-east-1")


@pytest.fixture()
def s3_with_objects():
    with moto.mock_aws():
        client = boto3.client("s3", region_name="us-east-1")
        client.create_bucket(Bucket=BUCKET)
        objects = {
            f"{PREFIX}/2024-01/data_01.parquet": b"P" * 128,
            f"{PREFIX}/2024-01/data_02.parquet": b"Q" * 256,
            f"{PREFIX}/2024-02/data_03.gz": b"G" * 64,
            f"{PREFIX}/2024-02/readme.txt": b"not data",  # wrong extension
            f"{PREFIX}/2024-02/empty.parquet": b"",  # zero-byte: dropped
        }
        for key, body in objects.items():
            client.put_object(Bucket=BUCKET, Key=key, Body=body)
        yield client


def _downloader(tmp_path):
    from de_polars_spark.sources.downloader import DataDownloader

    cfg = DataConfig(
        s3_bucket=BUCKET,
        s3_data_prefix=PREFIX,
        local_data_path=str(tmp_path / "cache"),
    )
    return DataDownloader(cfg)


def test_list_s3_keys_filters_and_paginates(s3_with_objects, tmp_path):
    keys = _downloader(tmp_path).list_s3_keys()
    assert sorted(keys) == [
        f"{PREFIX}/2024-01/data_01.parquet",
        f"{PREFIX}/2024-01/data_02.parquet",
        f"{PREFIX}/2024-02/data_03.gz",
    ]


def test_download_data_locally_and_skip_existing(s3_with_objects, tmp_path):
    dl = _downloader(tmp_path)
    result = dl.download_data_locally(show_progress=False)
    assert result == {"downloaded": 3, "skipped": 0, "failed": 0}
    mirrored = os.path.join(dl.config.local_data_path, "2024-01/data_01.parquet")
    assert os.path.getsize(mirrored) == 128
    # second run: everything already cached
    again = dl.download_data_locally(show_progress=False)
    assert again == {"downloaded": 0, "skipped": 3, "failed": 0}


def test_estimate_download_size_from_head_objects(s3_with_objects, tmp_path):
    est = _downloader(tmp_path).estimate_download_size()
    assert est["total_files"] == 3
    assert est["total_size_mb"] == round((128 + 256 + 64) / (1024 * 1024), 1)


def test_assume_role_chain_returns_sts_credentials():
    from de_polars_spark.sources.auth import resolve_credentials

    with moto.mock_aws():
        creds = resolve_credentials(
            aws_region="us-west-2",
            role_arn="arn:aws:iam::123456789012:role/analytics",
            external_id="ext-42",
        )
    assert creds["region"] == "us-west-2"
    assert creds["access_key"].startswith("ASIA")  # STS temp-key prefix
    assert creds["secret_key"] and creds["token"]


def test_get_boto3_client_with_explicit_keys_builds_working_client():
    from de_polars_spark.sources.auth import get_boto3_client

    with moto.mock_aws():
        client = get_boto3_client(
            "s3",
            aws_region="us-east-1",
            aws_access_key_id="AKIAEXPLICIT",
            aws_secret_access_key="secret",
        )
        client.create_bucket(Bucket="made-by-chain")
        names = [b["Name"] for b in client.list_buckets()["Buckets"]]
    assert "made-by-chain" in names


@pytest.fixture()
def pricing_backend():
    """Backend with its three clients wrapped in botocore Stubbers."""
    from de_polars_spark.sources.pricing import Boto3PricingBackend

    backend = Boto3PricingBackend(region="us-east-1")
    stubs = {
        "pricing": Stubber(backend._pricing),
        "ec2": Stubber(backend._ec2),
        "sp": Stubber(backend._sp),
    }
    yield backend, stubs
    for st in stubs.values():
        st.deactivate()


def test_pricing_get_products_parses_pricelist(pricing_backend):
    backend, stubs = pricing_backend
    product = {
        "terms": {
            "OnDemand": {
                "X.Y": {
                    "priceDimensions": {
                        "X.Y.Z": {"pricePerUnit": {"USD": "0.0416"}}
                    }
                }
            }
        }
    }
    stubs["pricing"].add_response(
        "get_products", {"PriceList": [json.dumps(product)]}
    )
    stubs["pricing"].activate()
    price = backend.get_products_price("m5.large", "us-east-1", "Linux")
    assert price == 0.0416
    stubs["pricing"].assert_no_pending_responses()


def test_pricing_spot_and_metadata(pricing_backend):
    backend, stubs = pricing_backend
    stubs["ec2"].add_response(
        "describe_spot_price_history",
        {"SpotPriceHistory": [{"SpotPrice": "0.0123"}]},
    )
    stubs["ec2"].add_response(
        "describe_instance_types",
        {
            "InstanceTypes": [
                {
                    "InstanceType": "m5.large",
                    "VCpuInfo": {"DefaultVCpus": 2},
                    "MemoryInfo": {"SizeInMiB": 8192},
                    "InstanceStorageSupported": False,
                    "NetworkInfo": {"NetworkPerformance": "Up to 10 Gigabit"},
                    "CurrentGeneration": True,
                }
            ]
        },
    )
    stubs["ec2"].activate()
    assert backend.get_spot_price("m5.large", "us-east-1") == 0.0123
    meta = backend.get_instance_metadata("m5.large")
    assert meta["vcpu"] == 2 and meta["memory_gb"] == 8.0
    assert meta["storage"] == "EBS only"
    stubs["ec2"].assert_no_pending_responses()


def test_pricing_savings_plans_shape(pricing_backend):
    backend, stubs = pricing_backend
    stubs["sp"].add_response(
        "describe_savings_plans",
        {
            "savingsPlans": [
                {
                    "savingsPlanArn": "arn:aws:savingsplans::123:plan/sp-1",
                    "savingsPlanId": "sp-1",
                    "savingsPlanType": "Compute",
                    "commitment": "1.50",
                    "termDurationInSeconds": 94608000,  # 3 years
                    "state": "active",
                }
            ]
        },
    )
    stubs["sp"].activate()
    plans = backend.get_savings_plans()
    assert plans == [
        {
            "savings_plan_arn": "arn:aws:savingsplans::123:plan/sp-1",
            "savings_plan_id": "sp-1",
            "offering_type": "Compute",
            "commitment_usd_per_hour": 1.5,
            "term_years": 3,
            "discount_rate": None,
            "state": "active",
        }
    ]
    stubs["sp"].assert_no_pending_responses()
