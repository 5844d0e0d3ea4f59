"""Promote the staged bench baseline (VERDICT r7 item 2).

Protocol: a round's final bench run writes its refreshed minima to
`bench_baseline_next.json` and LEAVES `bench_baseline.json` at the
prior round, so the driver's BENCH_r{N}.json — recorded after the
round closes — computes its drift section against the PRIOR round's
committed baseline (`drift.baseline_round == N-1`, non-vacuous).
The NEXT round's first act runs this script to promote the staged
file:

    python tools/promote_bench_baseline.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CUR = os.path.join(ROOT, "bench_baseline.json")
NXT = os.path.join(ROOT, "bench_baseline_next.json")


def main() -> None:
    if not os.path.isfile(NXT):
        raise SystemExit("bench_baseline_next.json not staged — nothing to promote")
    with open(NXT) as f:
        nxt = json.load(f)
    with open(CUR) as f:
        cur = json.load(f)
    if nxt.get("round", 0) <= cur.get("round", 0):
        raise SystemExit(
            f"staged round {nxt.get('round')} is not newer than "
            f"current {cur.get('round')} — refusing"
        )
    shutil.move(NXT, CUR)
    print(
        f"promoted: baseline now round {nxt['round']} "
        f"({len(nxt.get('queries', {}))} queries, total {nxt.get('total')})"
    )


if __name__ == "__main__":
    main()
