"""S3 → local cache downloader + size/cost estimator (reference
de_polars/data/data_downloader.py:14-240).

The downloader is a driver-side boto3 utility (network-bound; Spark's
S3A reads don't need it — this exists for the reference's
"download once, query locally free" workflow). The estimators are pure
math, kept separately testable; the reference's public constants are
preserved: 10 MB/s assumed throughput, $5/TB-scanned, 20 queries/month.
"""

from __future__ import annotations

import concurrent.futures
import os
from typing import Optional

from de_polars_spark.config import DataConfig

ASSUMED_DOWNLOAD_MBPS = 10.0  # data_downloader.py:221-224
COST_PER_TB_QUERY = 5.0  # data_downloader.py:233-240
ESTIMATED_MONTHLY_QUERIES = 20
SAMPLE_FILES_FOR_ESTIMATE = 10


def estimate_download_time(size_mb: float) -> str:
    """Human-readable time at the assumed throughput
    (data_downloader.py:221-231)."""
    seconds = size_mb / ASSUMED_DOWNLOAD_MBPS
    if seconds < 60:
        return f"{int(seconds)} seconds"
    if seconds < 3600:
        return f"{int(seconds / 60)} minutes"
    return f"{int(seconds / 3600)} hours"


def estimate_query_cost_savings(size_mb: float) -> float:
    """Monthly savings if queries hit local cache instead of S3
    (data_downloader.py:233-240)."""
    size_tb = size_mb / (1024 * 1024)
    return round(size_tb * ESTIMATED_MONTHLY_QUERIES * COST_PER_TB_QUERY, 2)


def estimate_from_sample_sizes(
    sampled_bytes: list[int], total_files: int
) -> dict:
    """Extrapolate a full-dataset estimate from <=10 sampled object sizes
    (data_downloader.py:169-219 math, separated from the S3 calls)."""
    if total_files == 0 or not sampled_bytes:
        return {
            "total_files": 0,
            "total_size_mb": 0,
            "estimated_download_time": "N/A",
            "potential_monthly_savings": 0,
        }
    total = sum(sampled_bytes)
    if total_files > len(sampled_bytes):
        total = total / len(sampled_bytes) * total_files
    size_mb = total / (1024 * 1024)
    return {
        "total_files": total_files,
        "total_size_mb": round(size_mb, 1),
        "estimated_download_time": estimate_download_time(size_mb),
        "potential_monthly_savings": estimate_query_cost_savings(size_mb),
    }


def check_local_data_status(local_path: Optional[str]) -> dict:
    """Local cache census (local_data_manager.py:97-157 parity)."""
    if not local_path or not os.path.isdir(local_path):
        return {"has_local_data": False, "file_count": 0, "total_size_mb": 0}
    count = 0
    size = 0
    for dirpath, _dirs, files in os.walk(local_path):
        for name in files:
            if name.endswith(".parquet"):
                count += 1
                size += os.path.getsize(os.path.join(dirpath, name))
    return {
        "has_local_data": count > 0,
        "file_count": count,
        "total_size_mb": round(size / (1024 * 1024), 2),
    }


class DataDownloader:
    """Parallel S3 → local mirror (data_downloader.py:26-167)."""

    def __init__(self, config: DataConfig, max_workers: int = 5):
        if not config.s3_bucket:
            raise ValueError("DataConfig.s3_bucket is required to download")
        if not config.local_data_path:
            raise ValueError("DataConfig.local_data_path is required to download")
        self.config = config
        self.max_workers = max_workers  # reference pool width (:122)

    def _client(self):
        from de_polars_spark.sources.auth import get_boto3_client

        return get_boto3_client("s3", aws_region=self.config.aws_region)

    def list_s3_keys(self) -> list[str]:
        """Paginated object listing under the configured prefix, parquet
        and gz only, zero-byte objects dropped (s3_data_manager.py:24-63
        filter rules)."""
        client = self._client()
        keys: list[str] = []
        paginator = client.get_paginator("list_objects_v2")
        for page in paginator.paginate(
            Bucket=self.config.s3_bucket,
            Prefix=self.config.s3_data_prefix.strip("/"),
        ):
            for obj in page.get("Contents", []):
                key = obj["Key"]
                if obj.get("Size", 0) > 0 and key.endswith((".parquet", ".gz")):
                    keys.append(key)
        return keys

    def download_data_locally(
        self, overwrite: bool = False, show_progress: bool = True
    ) -> dict:
        """Mirror S3 objects to the local cache dir, skipping files that
        already exist unless ``overwrite`` (data_downloader.py:26-114).
        Returns {downloaded, skipped, failed} counts."""
        client = self._client()
        keys = self.list_s3_keys()
        prefix = self.config.s3_data_prefix.strip("/")
        root = self.config.local_data_path
        tasks = []
        skipped = 0
        for key in keys:
            rel = key[len(prefix):].lstrip("/") if prefix else key
            dest = os.path.join(root, rel)
            if not overwrite and os.path.exists(dest):
                skipped += 1
                continue
            tasks.append((key, dest))

        failed = 0

        def fetch(task: tuple[str, str]) -> bool:
            key, dest = task
            try:
                os.makedirs(os.path.dirname(dest), exist_ok=True)
                client.download_file(self.config.s3_bucket, key, dest)
                return True
            except Exception:
                return False

        with concurrent.futures.ThreadPoolExecutor(
            max_workers=self.max_workers
        ) as pool:
            for i, ok in enumerate(pool.map(fetch, tasks), 1):
                if not ok:
                    failed += 1
                if show_progress and (i % 25 == 0 or i == len(tasks)):
                    print(f"  downloaded {i}/{len(tasks)}")
        return {
            "downloaded": len(tasks) - failed,
            "skipped": skipped,
            "failed": failed,
        }

    def estimate_download_size(self) -> dict:
        """head_object over a <=10-file sample, extrapolated
        (data_downloader.py:169-219)."""
        client = self._client()
        keys = self.list_s3_keys()
        sampled = []
        for key in keys[:SAMPLE_FILES_FOR_ESTIMATE]:
            try:
                head = client.head_object(Bucket=self.config.s3_bucket, Key=key)
                sampled.append(head["ContentLength"])
            except Exception:
                continue
        return estimate_from_sample_sizes(sampled, len(keys))

    def check_local_data_status(self) -> dict:
        return check_local_data_status(self.config.local_data_path)
