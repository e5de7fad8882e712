"""Data-quality and configuration validation (reference
de_polars/utils/validators.py:14-277), re-expressed as Spark jobs.

The reference ran five separate full scans over a Polars frame (negative
costs, per-column nulls, max date, distinct count). Here every per-row
check is folded into ONE aggregation pass (conditional counts), with the
duplicate check as a second job only because exact distinct-of-all-columns
cannot share that pass — at 100 TB that is the difference between 2 scans
and 6.
"""

from __future__ import annotations

import os
import re
import shutil
from datetime import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

REQUIRED_COLUMNS = ["line_item_unblended_cost"]
CRITICAL_COLUMNS = ["line_item_unblended_cost", "product_servicecode"]


def validate_cost_data(
    df: DataFrame,
    now: datetime | None = None,
    check_duplicates: bool = True,
) -> dict:
    """Quality report over a cost DataFrame (validators.py:14-96).

    Same issue/warning/recommendation taxonomy and scoring as the
    reference (20 points per issue, 5 per warning, validators.py:99-110).
    ``now`` is injectable for the staleness check; ``check_duplicates``
    can be disabled to skip the second (distinct-count) job on huge
    inputs.
    """
    issues: list[str] = []
    warnings: list[str] = []
    recommendations: list[str] = []

    missing = [c for c in REQUIRED_COLUMNS if c not in df.columns]
    if missing:
        issues.append(f"Missing required columns: {missing}")
        recommendations.append("Verify data export configuration")

    aggs = [F.count(F.lit(1)).alias("__n")]
    if "line_item_unblended_cost" in df.columns:
        aggs.append(
            F.count_if(F.col("line_item_unblended_cost") < 0).alias("__neg")
        )
    for col in CRITICAL_COLUMNS:
        if col in df.columns:
            aggs.append(F.count_if(F.col(col).isNull()).alias(f"__null_{col}"))
    if "line_item_usage_start_date" in df.columns:
        aggs.append(F.max("line_item_usage_start_date").alias("__latest"))

    row = df.agg(*aggs).collect()[0].asDict()
    total_rows = row["__n"]
    if total_rows == 0:
        return {
            "valid": False,
            "issues": ["DataFrame is empty"],
            "recommendations": ["Check data source and filters"],
        }

    if row.get("__neg", 0) > 0:
        warnings.append(f"Found {row['__neg']} rows with negative costs")
        recommendations.append(
            "Review negative cost entries - may indicate credits or refunds"
        )

    for col in CRITICAL_COLUMNS:
        nulls = row.get(f"__null_{col}")
        if nulls is None:
            continue
        pct = nulls / total_rows * 100
        if pct > 10:
            issues.append(f"High null percentage in {col}: {pct:.1f}%")
            recommendations.append(f"Investigate data quality issues in {col}")
        elif pct > 0:
            warnings.append(f"Some null values in {col}: {pct:.1f}%")

    latest = row.get("__latest")
    if latest is not None:
        try:
            if isinstance(latest, str):
                latest = datetime.fromisoformat(latest.replace("Z", "+00:00"))
            days_old = ((now or datetime.now()) - latest).days
            if days_old > 7:
                warnings.append(
                    f"Data may be stale - latest date is {days_old} days old"
                )
                recommendations.append("Check if data refresh is needed")
        except (TypeError, ValueError):
            warnings.append("Unable to validate data freshness")

    if check_duplicates:
        dup = total_rows - df.distinct().count()
        if dup > 0:
            warnings.append(
                f"Found {dup} duplicate rows ({dup / total_rows * 100:.1f}%)"
            )
            recommendations.append(
                "Consider deduplication if duplicates are unexpected"
            )

    score = max(0.0, min(100.0, 100.0 - 20 * len(issues) - 5 * len(warnings)))
    return {
        "valid": not issues,
        "total_rows": total_rows,
        "total_columns": len(df.columns),
        "issues": issues,
        "warnings": warnings,
        "recommendations": recommendations,
        "data_quality_score": score,
    }


_DATE_PATTERNS = {
    "CUR2.0": (r"^\d{4}-\d{2}$", "YYYY-MM (e.g., 2025-01)"),
    "FOCUS1.0": (r"^\d{4}-\d{2}$", "YYYY-MM (e.g., 2025-01)"),
    "COH": (r"^\d{4}-\d{2}-\d{2}$", "YYYY-MM-DD (e.g., 2025-01-15)"),
    "CARBON_EMISSION": (r"^\d{4}-\d{2}$", "YYYY-MM (e.g., 2025-01)"),
}


def validate_date_range(
    start_date: str | None, end_date: str | None, export_type: str
) -> dict:
    """Per-export-type date-range validation (validators.py:113-161)."""
    pattern, description = _DATE_PATTERNS.get(
        export_type, (r"^\d{4}-\d{2}$", "YYYY-MM")
    )
    issues = []
    if start_date and not re.match(pattern, start_date):
        issues.append(f"start_date format invalid. Expected: {description}")
    if end_date and not re.match(pattern, end_date):
        issues.append(f"end_date format invalid. Expected: {description}")
    if start_date and end_date and start_date > end_date:
        issues.append("start_date cannot be after end_date")
    return {"valid": not issues, "issues": issues, "expected_format": description}


VALID_EXPORT_TYPES = ["CUR2.0", "FOCUS1.0", "COH", "CARBON_EMISSION"]


def _valid_bucket_name(name: str) -> bool:
    # AWS naming rules subset (validators.py:209-230)
    if not 3 <= len(name) <= 63:
        return False
    if not re.match(r"^[a-z0-9].*[a-z0-9]$", name):
        return False
    if not re.match(r"^[a-z0-9.-]+$", name):
        return False
    if ".." in name:
        return False
    return not re.match(r"^\d+\.\d+\.\d+\.\d+$", name)


def validate_s3_config(s3_bucket: str, s3_prefix: str, data_export_type: str) -> dict:
    """S3 source-config validation (validators.py:168-206)."""
    issues, warnings = [], []
    if not s3_bucket:
        issues.append("S3 bucket name is required")
    elif not _valid_bucket_name(s3_bucket):
        issues.append("S3 bucket name format is invalid")
    if not s3_prefix:
        warnings.append("S3 prefix is empty - will search entire bucket")
    elif s3_prefix.startswith("/"):
        warnings.append("S3 prefix should not start with '/'")
    if data_export_type not in VALID_EXPORT_TYPES:
        issues.append(
            f"Invalid data_export_type. Must be one of: {VALID_EXPORT_TYPES}"
        )
    return {"valid": not issues, "issues": issues, "warnings": warnings}


def validate_local_path(local_path: str) -> dict:
    """Local cache-path validation (validators.py:233-278)."""
    if not local_path:
        return {"valid": True, "issues": [], "warnings": ["No local path specified"]}
    issues, warnings = [], []
    if not os.path.exists(local_path):
        warnings.append(f"Local path does not exist: {local_path}")
        parent = os.path.dirname(local_path) or "."
        if not os.path.exists(parent):
            issues.append(f"Parent directory does not exist: {parent}")
        elif not os.access(parent, os.W_OK):
            issues.append(f"Cannot write to parent directory: {parent}")
    else:
        if not os.access(local_path, os.W_OK):
            issues.append(f"Local path is not writable: {local_path}")
        try:
            free = shutil.disk_usage(local_path).free
            if free < 1_000_000_000:
                warnings.append(
                    f"Low disk space available: {free / 1_000_000_000:.1f}GB"
                )
        except OSError:
            warnings.append("Unable to check disk space")
    return {"valid": not issues, "issues": issues, "warnings": warnings}
