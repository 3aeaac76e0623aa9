#!/usr/bin/env python3
"""Compute the driver-sample rotation for ``_SAMPLE_FIRST`` mechanically.

The per-round driver samples a prefix of ``queries()`` for its CORRECTNESS
check, so every registry entry that has never appeared in any
``CORRECTNESS_r*.json`` must sort *before* every entry that already has a
green record — otherwise the newest queries are skipped round after round
(the r5→r6 and r7→r8 process slip).  This script derives that order from
the CORRECTNESS files themselves so the rotation can never go stale:

    python scripts/sample_order.py            # print the rotation, one name/line
    python scripts/sample_order.py --check    # exit 1 if queries.py's order is stale
    python scripts/sample_order.py --unrecorded   # only the never-recorded names

The rotation is: unrecorded entries first (in current registry order, which
is stable insertion order), then the previously recorded entries in their
existing ``_SAMPLE_FIRST`` order (most-recently-rotated first) so a larger
driver sample still re-covers the newest recorded work before the long tail.
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def recorded_names(repo: str = REPO) -> set[str]:
    """Union of query names across every CORRECTNESS_r*.json in the repo."""
    out: set[str] = set()
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            out |= set(json.load(f).keys())
    return out


def registry_names() -> list[str]:
    sys.path.insert(0, REPO)
    from airflow_etl_spark import queries as q

    return list(q._REGISTRY.keys())


def current_sample_first() -> list[str]:
    sys.path.insert(0, REPO)
    from airflow_etl_spark import queries as q

    return list(q._SAMPLE_FIRST)


def rotation(repo: str = REPO) -> tuple[list[str], list[str]]:
    """Return (unrecorded, recorded_in_current_sample_order)."""
    rec = recorded_names(repo)
    reg = registry_names()
    unrecorded = [n for n in reg if n not in rec]
    cur = current_sample_first()
    seen = set(unrecorded)
    recorded_tail: list[str] = []
    for n in cur + reg:
        if n in seen or n not in rec:
            continue
        seen.add(n)
        recorded_tail.append(n)
    return unrecorded, recorded_tail


def check() -> int:
    """Exit 0 iff every unrecorded name sorts before every recorded one."""
    rec = recorded_names()
    reg = set(registry_names())
    order = current_sample_first()
    missing = reg - set(order)
    if missing:
        print(f"STALE: {len(missing)} registry entries absent from _SAMPLE_FIRST: "
              f"{sorted(missing)[:10]}...")
        return 1
    first_recorded = next((i for i, n in enumerate(order) if n in rec), len(order))
    late_unrecorded = [n for n in order[first_recorded:] if n not in rec and n in reg]
    if late_unrecorded:
        print(f"STALE: {len(late_unrecorded)} unrecorded entries sort after a "
              f"recorded one: {late_unrecorded[:10]}")
        return 1
    print(f"OK: {first_recorded} unrecorded entries lead, "
          f"{len(order) - first_recorded} recorded follow.")
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--unrecorded", action="store_true")
    args = ap.parse_args()
    if args.check:
        return check()
    unrec, rest = rotation()
    names = unrec if args.unrecorded else unrec + rest
    for n in names:
        print(n)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
