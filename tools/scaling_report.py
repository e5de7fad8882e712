"""Three-point scale-evidence table from committed bench artifacts.

Joins the per-query maps of a base recording (default sf0.1 min-of-3)
with one or more larger-scale recordings and prints a markdown table of
timings and scaling ratios, flagging rows that grow faster than the
data. This is how the committed ladder (BENCH_full_r07 / _sf1_r07 /
_sf3_subset_r07) is rendered for SURVEY — rerun it against any newer
artifacts to refresh the evidence without hand-editing numbers.

Usage:
    python tools/scaling_report.py BASE.json SCALED.json [SCALED2.json ...]

Artifact rows ("artifact:*") are carried through like queries — builds
must scale too. Rows missing from a scaled run print "-" (subset runs
cover only the scale-sensitive slice).
"""

from __future__ import annotations

import json
import sys


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
    import os

    return f"sf{sf:g}" if sf is not None else os.path.basename(path)


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    base_path, scaled_paths = sys.argv[1], sys.argv[2:]
    base, base_sf = load(base_path)
    scaled = [(p, *load(p)) for p in scaled_paths]

    base_lbl = sf_label(base_path, base_sf)
    hdr = ["query", base_lbl]
    for p, _, sf in scaled:
        lbl = sf_label(p, sf)
        hdr += [lbl, f"×({lbl}/{base_lbl})"]
    print("| " + " | ".join(hdr) + " |")
    print("|" + "---|" * len(hdr))

    # order: every key of the LAST (usually smallest/most curated) scaled
    # map first, then remaining base keys — keeps subset slices on top
    keys = list(scaled[-1][1]) + [k for k in base if k not in scaled[-1][1]]
    for k in keys:
        b = base.get(k)
        cells = [k, f"{b:.2f}" if b is not None else "-"]
        for _, rows, _ in scaled:
            v = rows.get(k)
            cells.append(f"{v:.2f}" if v is not None else "-")
            cells.append(
                f"{v / b:.1f}" if (v is not None and b) else "-"
            )
        print("| " + " | ".join(cells) + " |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
