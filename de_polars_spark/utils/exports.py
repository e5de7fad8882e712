"""Export sinks and report generation (reference
de_polars/utils/exports.py:17-344).

Two regimes, chosen by destination:

- **Distributed sinks** (`df.write.*`) for paths — parquet/CSV/JSON
  written by executors in parallel; this is the only shape that works at
  100 TB. ``single_file=True`` coalesces to one part for the reference's
  one-file-per-export behavior on small results.
- **Driver-side strings** for the API edge (JSON/CSV response bodies,
  text/markdown reports) — the reference's `to_dicts()` path; bounded by
  the API row caps, so collecting is correct here.
"""

from __future__ import annotations

import io
import json
from datetime import datetime

from pyspark.sql import DataFrame


def _records(df: DataFrame) -> list[dict]:
    # Arrow-batched transfer (session enables arrow); one collect at the edge.
    pdf = df.toPandas()
    return json.loads(pdf.to_json(orient="records", date_format="iso"))


class DataExporter:
    """Format exports for query results (exports.py:13-208)."""

    @staticmethod
    def export_to_json(data, file_path: str | None = None, indent: int = 2):
        """DataFrame or dict -> JSON string (or file). exports.py:17-44."""
        payload = _records(data) if isinstance(data, DataFrame) else data
        text = json.dumps(payload, indent=indent, default=str)
        if file_path:
            with open(file_path, "w", encoding="utf-8") as fh:
                fh.write(text)
            return None
        return text

    @staticmethod
    def export_to_csv(
        df: DataFrame,
        file_path: str | None = None,
        include_headers: bool = True,
        single_file: bool = True,
    ):
        """DataFrame -> CSV string or path (exports.py:47-68).

        With a path, writes through the distributed CSV sink
        (``single_file`` coalesces to one part first); without one,
        renders the CSV string driver-side for the API edge."""
        if file_path:
            writer = (df.coalesce(1) if single_file else df).write.mode("overwrite")
            writer.option("header", str(include_headers).lower()).csv(file_path)
            return None
        buf = io.StringIO()
        df.toPandas().to_csv(buf, index=False, header=include_headers)
        return buf.getvalue()

    @staticmethod
    def export_to_parquet(df: DataFrame, file_path: str, partition_by=None) -> None:
        """Distributed snappy-parquet sink (reference wrote via
        data_partitioner.py:38-52; snappy is Spark's default codec)."""
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(file_path)

    @staticmethod
    def export_to_orc(df: DataFrame, file_path: str, partition_by=None) -> None:
        """Distributed ORC sink (beyond reference — same layout options
        as the parquet sink, for ORC-standardized downstream stacks)."""
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.orc(file_path)

    @staticmethod
    def export_to_excel(
        df: DataFrame,
        file_path: str,
        sheet_name: str = "Sheet1",
        include_headers: bool = True,
    ) -> None:
        """Excel via pandas (exports.py:71-89); the xlsx engine is an
        optional dependency exactly as in the reference."""
        try:
            df.toPandas().to_excel(
                file_path, sheet_name=sheet_name, index=False, header=include_headers
            )
        except ImportError as exc:
            raise ImportError(
                "Excel export requires an xlsx engine (openpyxl/xlsxwriter)"
            ) from exc

    @staticmethod
    def export_summary_report(
        data: dict, format: str = "json", file_path: str | None = None
    ):
        """Dict report -> json/txt/markdown (exports.py:92-123)."""
        fmt = format.lower()
        if fmt == "json":
            return DataExporter.export_to_json(data, file_path)
        if fmt == "txt":
            text = _render_report(data, markdown=False)
        elif fmt == "markdown":
            text = _render_report(data, markdown=True)
        else:
            raise ValueError(f"Unsupported format: {format}")
        if file_path:
            with open(file_path, "w", encoding="utf-8") as fh:
                fh.write(text)
            return None
        return text


def _format_value(key: str, value) -> str:
    # cost-aware scalar rendering (exports.py:152-158)
    if isinstance(value, (int, float)) and "cost" in key.lower():
        return f"${value:,.2f}"
    if isinstance(value, float) and "percentage" in key.lower():
        return f"{value:.1f}%"
    return str(value)


def _render_report(data: dict, markdown: bool, now: datetime | None = None) -> str:
    """Shared txt/markdown renderer (exports.py:126-208: same traversal,
    list caps of 5 for txt / 10 for markdown)."""
    stamp = (now or datetime.now()).strftime("%Y-%m-%d %H:%M:%S")
    cap = 10 if markdown else 5
    lines: list[str] = []
    if markdown:
        lines += ["# FinOps Cost Analytics Report", "", f"**Generated:** {stamp}", ""]
    else:
        lines += ["FINOPS COST ANALYTICS REPORT", "=" * 40, f"Generated: {stamp}", ""]

    def walk(section: dict, level: int) -> None:
        for key, value in section.items():
            title = key.replace("_", " ").title()
            if isinstance(value, dict):
                if markdown:
                    lines.append(f"{'#' * (level + 2)} {title}")
                    lines.append("")
                else:
                    lines.append(f"{'  ' * level}{title}:")
                walk(value, level + 1)
            elif isinstance(value, list):
                if markdown:
                    lines.append(f"{'#' * (level + 2)} {title}")
                    lines.append("")
                else:
                    lines.append(f"{'  ' * level}{title}:")
                for item in value[:cap]:
                    if isinstance(item, dict):
                        walk(item, level + 1)
                    elif markdown:
                        lines.append(f"- {item}")
                    else:
                        lines.append(f"{'  ' * level}  - {item}")
                if len(value) > cap:
                    extra = len(value) - cap
                    if markdown:
                        lines.append(f"- *... and {extra} more items*")
                    else:
                        lines.append(f"{'  ' * level}  ... and {extra} more")
                if markdown:
                    lines.append("")
            else:
                rendered = _format_value(key, value)
                if markdown:
                    lines.append(f"**{title}:** {rendered}")
                    lines.append("")
                else:
                    lines.append(f"{'  ' * level}{title}: {rendered}")

    walk(data, 0)
    return "\n".join(lines)


class ReportGenerator:
    """Executive-summary assembly (exports.py:211-344)."""

    @staticmethod
    def generate_executive_summary(
        kpi_data: dict, spend_data: dict, optimization_data: dict,
        now: datetime | None = None,
    ) -> dict:
        total_spend = kpi_data.get("overall_spend", {}).get("spend_all_cost", 0)
        savings = kpi_data.get("savings_summary", {}).get("total_potential_savings", 0)
        mom_change = spend_data.get("mom_change", 0)
        savings_ratio = (savings / total_spend * 100) if total_spend > 0 else 0
        return {
            "executive_summary": {
                "report_date": (now or datetime.now()).strftime("%Y-%m-%d"),
                "key_metrics": {
                    "current_monthly_spend": total_spend,
                    "optimization_potential": savings,
                    "potential_savings_percentage": savings_ratio,
                    "month_over_month_change": mom_change,
                },
                "highlights": ReportGenerator._highlights(
                    total_spend, savings, mom_change, optimization_data
                ),
                "recommendations": ReportGenerator._recommendations(
                    savings_ratio, mom_change, optimization_data
                ),
                "risk_assessment": ReportGenerator._risks(mom_change, savings_ratio),
            }
        }

    @staticmethod
    def _highlights(total_spend, savings, mom_change, optimization_data) -> list[str]:
        # exports.py:255-282
        out = []
        if total_spend > 0:
            out.append(f"Monthly cloud spend: ${total_spend:,.2f}")
        if savings > 0:
            out.append(f"Identified ${savings:,.2f} in potential monthly savings")
        if abs(mom_change) > 5:
            trend = "increased" if mom_change > 0 else "decreased"
            out.append(f"Spend {trend} {abs(mom_change):.1f}% from last month")
        idle = optimization_data.get("idle_resources", [])
        if idle:
            out.append(f"Found {len(idle)} idle resources for review")
        return out

    @staticmethod
    def _recommendations(savings_ratio, mom_change, optimization_data) -> list[str]:
        # exports.py:285-310 (threshold ladder preserved, order included)
        out = []
        if savings_ratio > 15:
            out.append("HIGH PRIORITY: Significant cost optimization opportunities identified")
        if mom_change > 15:
            out.append("URGENT: Investigate rapid cost growth causes")
        if savings_ratio > 10:
            out.append("Implement cost optimization initiatives this quarter")
        if mom_change > 10:
            out.append("Review recent infrastructure changes and scaling events")
        if len(optimization_data.get("idle_resources", [])) > 10:
            out.append("Clean up idle resources to reduce waste")
        return out or ["Continue monitoring cost trends and optimization opportunities"]

    @staticmethod
    def _risks(mom_change, savings_ratio) -> dict:
        # exports.py:313-344
        level, factors = "LOW", []
        if mom_change > 20:
            level, factors = "HIGH", ["Rapid cost growth"]
        elif mom_change > 10:
            level, factors = "MEDIUM", ["Moderate cost increase"]
        if savings_ratio > 20:
            if level == "LOW":
                level = "MEDIUM"
            factors.append("High optimization potential indicates inefficiency")
        advice = {
            "LOW": "Continue current monitoring and optimization practices",
            "MEDIUM": "Increase monitoring frequency and implement cost controls",
            "HIGH": "Immediate action required - review and implement cost optimization measures",
        }
        return {
            "risk_level": level,
            "risk_factors": factors,
            "recommendation": advice.get(level, "Review cost management practices"),
        }
