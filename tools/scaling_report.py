"""Three-point scale-evidence table from committed bench artifacts.

Joins the per-query maps of a base recording (default sf0.1 min-of-3)
with one or more larger-scale recordings and prints a markdown table of
timings and scaling ratios. This is how the committed ladder is
rendered for SURVEY — rerun it against any newer artifacts to refresh
the evidence without hand-editing numbers; ``tests/test_anchors.py``
regenerates the committed SCALING file from the committed bench
artifacts and fails if they drift.

Usage:
    python tools/scaling_report.py BASE.json SCALED.json [SCALED2.json ...]

Artifact rows ("artifact:*") are carried through like queries — builds
must scale too. Rows missing from a scaled run print "-" (subset runs
cover only the scale-sensitive slice). Rows in the exact-anchor
contract (``de_polars_spark.inventory.anchors``) are marked — their
super-linear growth is the documented opt-out, and the footnote names
the production twin a reader should look at instead.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def load(path: str) -> tuple[dict[str, float], float | None]:
    with open(path) as fh:
        obj = json.load(fh)
    rows = {k: float(v) for k, v in obj.get("queries", {}).items()}
    rows.update(
        {k: float(v) for k, v in obj.get("artifact_builds", {}).items()}
    )
    return rows, obj.get("sf")


def sf_label(path: str, sf: float | None) -> str:
    # Raw stdout captures accepted by bench_compare may lack "sf";
    # fall back to the filename instead of raising on f"sf{None:g}".
    return f"sf{sf:g}" if sf is not None else os.path.basename(path)


def render(base_path: str, scaled_paths: list[str]) -> str:
    from de_polars_spark.inventory.anchors import EXACT_ANCHORS

    base, base_sf = load(base_path)
    scaled = [(p, *load(p)) for p in scaled_paths]

    # machine-readable provenance line: tests/test_anchors.py re-renders
    # the committed table from exactly these artifacts and fails on drift
    srcs = " ".join(os.path.basename(p) for p in [base_path, *scaled_paths])
    out_header = f"<!-- regenerate: python tools/scaling_report.py {srcs} -->"

    base_lbl = sf_label(base_path, base_sf)
    hdr = ["query", base_lbl]
    for p, _, sf in scaled:
        lbl = sf_label(p, sf)
        hdr += [lbl, f"×({lbl}/{base_lbl})"]
    out = [out_header, "| " + " | ".join(hdr) + " |", "|" + "---|" * len(hdr)]

    # order: every key of the LAST (usually smallest/most curated) scaled
    # map first, then remaining base keys — keeps subset slices on top
    keys = list(scaled[-1][1]) + [k for k in base if k not in scaled[-1][1]]
    marks_used: dict[str, str] = {}
    for k in keys:
        b = base.get(k)
        label = k
        if k in EXACT_ANCHORS:
            mark = "†" if EXACT_ANCHORS[k]["kind"] == "anchor" else "‡"
            label = f"{k} {mark}"
            marks_used[k] = mark
        cells = [label, f"{b:.2f}" if b is not None else "-"]
        for _, rows, _ in scaled:
            v = rows.get(k)
            cells.append(f"{v:.2f}" if v is not None else "-")
            cells.append(
                f"{v / b:.1f}" if (v is not None and b) else "-"
            )
        out.append("| " + " | ".join(cells) + " |")

    if marks_used:
        out.append("")
        out.append(
            "† exact oracle anchor (deliberately super-linear; validates "
            "its capped/indexed twin) — ‡ recall/quality eval (the exact "
            "truth side IS the measurement). Production twins:"
        )
        for k in sorted(marks_used):
            info = EXACT_ANCHORS[k]
            out.append(
                f"- `{k}` {marks_used[k]} → scale path: "
                + ", ".join(f"`{t}`" for t in info["scale_path"])
            )
    return "\n".join(out) + "\n"


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    sys.stdout.write(render(sys.argv[1], sys.argv[2:]))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
