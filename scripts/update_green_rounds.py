#!/usr/bin/env python
"""Round-start chore: fold CORRECTNESS_r{N}.json into registry._GREEN_ROUNDS.

The verification rotation (registry.all_specs) orders queries
least-recently-verified first so every query's newest green row stays at
most ceil(N/50) rounds old under the driver's ~50-row cap (the length of
one full verification cycle over N registered queries). That only works if
each round's green set is recorded at the START of the next round; this
script prints the ready-to-paste dict entry and flags queries that are
about to go stale so the maintainer (human or agent) doesn't have to
hand-transcribe 50 names.

Usage: python scripts/update_green_rounds.py CORRECTNESS_r05.json
"""

from __future__ import annotations

import json
import sys
import textwrap


def green_names(path: str) -> list[str]:
    with open(path) as f:
        doc = json.load(f)
    out = []
    for name, row in doc.items():
        if not isinstance(row, dict) or row.get("err"):
            continue
        if (row.get("rows_match")
                and row.get("schema_match") in (True, None)
                and row.get("hash_match") in (True, None)):
            out.append(name)
    return sorted(out)


def main() -> int:
    path = sys.argv[1] if len(sys.argv) > 1 else "CORRECTNESS_r05.json"
    rnd = path.rsplit("_r", 1)[-1].split(".")[0]
    names = green_names(path)
    body = ", ".join(f'"{n}"' for n in names)
    block = textwrap.fill(body, width=72, initial_indent=" " * 8,
                          subsequent_indent=" " * 8)
    print(f'    "r{int(rnd):02d}": frozenset({{\n{block}\n    }}),')

    from research_data_pipeline_spark import registry as R  # noqa: E402

    specs = R.all_specs()
    stale = [
        n for n in specs
        if n not in names and R._green_count(n) == 0
    ]
    if stale:
        print(f"# NOT green in {path} and never green before "
              f"(investigate before round ends): {stale}", file=sys.stderr)

    # Queries at risk of breaching the cycle invariant: newest green row
    # would be MORE than ceil(N/50) rounds old if not re-verified in the
    # round that starts now (i.e. round max_round+1, assuming this file's
    # set was just pasted into _GREEN_ROUNDS making max_round = this round).
    this_round = int(rnd)
    cycle = max(1, -(-len(specs) // 50))
    at_risk = sorted(
        n for n in specs
        if n not in names
        and 0 < R._last_green(n) <= this_round + 1 - cycle
    )
    if at_risk:
        print(f"# At risk of breaching the {cycle}-round cycle invariant "
              f"if unverified in r{this_round + 1:02d}: {at_risk}",
              file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.path.insert(0, ".")
    raise SystemExit(main())
