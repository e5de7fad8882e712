"""The exact-anchor contract stays wired to reality: every anchor and
every named scale-path twin is a real inventory query, and the committed
SCALING table regenerates byte-identically from the committed bench
artifacts (so the scale evidence can't silently drift from the data)."""

from __future__ import annotations

import glob
import importlib.util
import os
import re

import pytest

from de_polars_spark.inventory import QUERIES
from de_polars_spark.inventory.anchors import EXACT_ANCHORS

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _scaling_report():
    spec = importlib.util.spec_from_file_location(
        "scaling_report", os.path.join(REPO, "tools", "scaling_report.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_every_anchor_is_an_inventory_query():
    missing = [n for n in EXACT_ANCHORS if n not in QUERIES]
    assert not missing, f"anchor names not in inventory: {missing}"


def test_every_scale_path_twin_exists_and_is_not_itself_an_anchor():
    for name, info in EXACT_ANCHORS.items():
        assert info["kind"] in ("anchor", "eval"), name
        assert info["scale_path"], f"{name}: empty scale path"
        for twin in info["scale_path"]:
            assert twin in QUERIES, f"{name}: twin {twin} not in inventory"
            assert twin not in EXACT_ANCHORS, (
                f"{name}: twin {twin} is itself an anchor — the contract "
                "must point at a production path"
            )


def test_committed_scaling_table_regenerates_from_committed_artifacts():
    # newest committed SCALING_r*.md carries a provenance line naming the
    # bench artifacts it was rendered from; re-render and compare.
    paths = glob.glob(os.path.join(REPO, "SCALING_r*.md"))
    if not paths:
        pytest.skip("no committed SCALING_r*.md yet")
    # numeric round sort — lexicographic would pick SCALING_r99 over
    # SCALING_r100 once rounds reach three digits
    newest = max(
        paths,
        key=lambda p: int(re.search(r"r(\d+)", os.path.basename(p)).group(1)),
    )
    with open(newest) as fh:
        committed = fh.read()
    m = re.match(
        r"<!-- regenerate: python tools/scaling_report\.py ([^>]+?) -->",
        committed,
    )
    if not m:
        pytest.skip(f"{os.path.basename(newest)} predates provenance lines")
    srcs = [os.path.join(REPO, s) for s in m.group(1).split()]
    for s in srcs:
        assert os.path.exists(s), f"missing committed bench artifact {s}"
    rendered = _scaling_report().render(srcs[0], srcs[1:])
    assert rendered == committed, (
        f"{os.path.basename(newest)} drifted from its bench artifacts — "
        "regenerate with the command in its provenance line"
    )
