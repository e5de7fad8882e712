"""Freshness flywheel: compute each round's driver re-certification head.

The driver samples the first ~50 ``queries()`` names per round. To keep
every inventory query's newest green driver row recent, the head for
round N is:

1. every inventory query with NO green driver row in any
   ``CORRECTNESS_r*.json`` (new queries added since the last round),
   in inventory order; then
2. the remaining queries sorted by (newest-green round ascending,
   inventory order), i.e. oldest-certified first;

truncated to the 50-slot driver budget.

The head is pinned to a **basis round** (``_HEAD_BASIS_ROUND`` in
``__spark_entry__.py``): ``compute_head(upto=basis)`` ignores any
``CORRECTNESS_r*.json`` newer than the basis, so the driver writing the
current round's artifact after the builder's final commit cannot
invalidate the committed head (r8 verdict: the unpinned guard failed on
every as-judged tree, by construction).

Usage::

    python tools/freshness.py                # histogram + next head at
                                             # the newest round on disk
    python tools/freshness.py --at-round N   # reproduce the head as it
                                             # was computed from rounds
                                             # r01..rN (any historical head)
    python tools/freshness.py --check        # exit 1 if __spark_entry__'s
                                             # head differs from the one
                                             # computed at its own basis

``tests/test_inventory_correctness.py::test_driver_head_matches_freshness_flywheel``
runs the ``--check`` logic so the committed head can never drift from
the flywheel.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HEAD_BUDGET = 50


def _green(v: dict) -> bool:
    # hash_match is None for rows-only (non-SQL-expressible) checks; the
    # driver records those as the weaker-but-still-green form.
    return bool(
        v.get("rows_match")
        and v.get("schema_match")
        and (v.get("hash_match") in (True, None))
        and not v.get("err")
    )


def newest_green_rounds(
    repo: str = REPO, upto: int | None = None
) -> dict[str, int]:
    """Map query name -> newest round <= ``upto`` with a green driver row.

    ``upto=None`` means every round on disk (the interactive default);
    the pytest guard always passes the committed basis so artifacts the
    driver writes *after* the head was cut are ignored.
    """
    newest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"r(\d+)", os.path.basename(path))
        if not m:
            continue
        rnd = int(m.group(1))
        if upto is not None and rnd > upto:
            continue
        with open(path) as f:
            rows = json.load(f)
        for name, v in rows.items():
            if _green(v):
                newest[name] = max(newest.get(name, 0), rnd)
    return newest


def compute_head(
    repo: str = REPO, budget: int = HEAD_BUDGET, upto: int | None = None
) -> list[str]:
    sys.path.insert(0, repo)
    from de_polars_spark.inventory import QUERIES

    inventory = list(QUERIES)
    index = {n: i for i, n in enumerate(inventory)}
    newest = newest_green_rounds(repo, upto=upto)
    never = [n for n in inventory if n not in newest]
    tail = sorted(
        (n for n in inventory if n in newest),
        key=lambda n: (newest[n], index[n]),
    )
    return (never + tail)[:budget]


def entry_head(repo: str = REPO) -> tuple[list[str], int]:
    """The committed head and the basis round it was computed from."""
    sys.path.insert(0, repo)
    import __spark_entry__ as entry

    return list(entry._RECERTIFY_HEAD), int(entry._HEAD_BASIS_ROUND)


def main(argv: list[str]) -> int:
    upto: int | None = None
    if "--at-round" in argv:
        upto = int(argv[argv.index("--at-round") + 1])
    if "--check" in argv:
        committed, basis = entry_head()
        computed = compute_head(upto=basis)
        if committed != computed:
            extra = [n for n in committed if n not in computed]
            missing = [n for n in computed if n not in committed]
            print(
                "freshness head drift: committed head != flywheel head\n"
                f"  only in committed: {extra}\n  only in computed: {missing}",
                file=sys.stderr,
            )
            return 1
        print(
            f"head OK ({len(committed)} names match the flywheel "
            f"at basis r{basis})"
        )
        return 0
    newest = newest_green_rounds(upto=upto)
    hist: dict[int, int] = {}
    for rnd in newest.values():
        hist[rnd] = hist.get(rnd, 0) + 1
    computed = compute_head(upto=upto)
    scope = f"rounds <= r{upto}" if upto is not None else "all rounds on disk"
    print(f"freshness histogram over {scope} (newest green row per query):")
    for rnd in sorted(hist):
        print(f"  r{rnd}: {hist[rnd]}")
    print(f"\nnext head ({len(computed)} names, oldest-green first):")
    for n in computed:
        print(f'    "{n}",  # newest green: r{newest.get(n, 0) or "-"}')
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
