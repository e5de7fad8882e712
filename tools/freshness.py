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

Usage::

    python tools/freshness.py            # print histogram + next head
    python tools/freshness.py --check    # exit 1 if __spark_entry__'s
                                         # head differs from the computed one

``tests/test_entry.py`` runs the ``--check`` form so the committed head
can never drift from the flywheel.
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


def newest_green_rounds(repo: str = REPO) -> dict[str, int]:
    """Map query name -> newest round with a green driver row."""
    newest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"r(\d+)", os.path.basename(path))
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            rows = json.load(f)
        for name, v in rows.items():
            if _green(v):
                newest[name] = max(newest.get(name, 0), rnd)
    return newest


def compute_head(repo: str = REPO, budget: int = HEAD_BUDGET) -> list[str]:
    sys.path.insert(0, repo)
    from de_polars_spark.inventory import QUERIES

    inventory = list(QUERIES)
    index = {n: i for i, n in enumerate(inventory)}
    newest = newest_green_rounds(repo)
    never = [n for n in inventory if n not in newest]
    tail = sorted(
        (n for n in inventory if n in newest),
        key=lambda n: (newest[n], index[n]),
    )
    return (never + tail)[:budget]


def entry_head(repo: str = REPO) -> list[str]:
    sys.path.insert(0, repo)
    import __spark_entry__ as entry

    return list(entry._RECERTIFY_HEAD)


def main(argv: list[str]) -> int:
    newest = newest_green_rounds()
    hist: dict[int, int] = {}
    for rnd in newest.values():
        hist[rnd] = hist.get(rnd, 0) + 1
    computed = compute_head()
    if "--check" in argv:
        committed = entry_head()
        if committed != computed:
            extra = [n for n in committed if n not in computed]
            missing = [n for n in computed if n not in committed]
            print(
                "freshness head drift: committed head != flywheel head\n"
                f"  only in committed: {extra}\n  only in computed: {missing}",
                file=sys.stderr,
            )
            return 1
        print(f"head OK ({len(committed)} names match the flywheel)")
        return 0
    print("freshness histogram (newest green driver row per query):")
    for rnd in sorted(hist):
        print(f"  r{rnd}: {hist[rnd]}")
    print(f"\nnext head ({len(computed)} names, oldest-green first):")
    for n in computed:
        print(f'    "{n}",  # newest green: r{newest.get(n, 0) or "-"}')
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
