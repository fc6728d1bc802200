"""Derive the driver-window rotation from first principles.

The rotation-by-staleness invariant (in force since r7, steady-state
contract pinned r10): every 50-entry driver window = the 13 pinned §2
core queries + the 37 stalest registry entries, never-driver-verified
first, then oldest last-green round, ties broken by current registry
order. Until r10 the windows were hand-enumerated and test-pinned; this
tool DERIVES them from the CORRECTNESS_r*.json history so the next
rotation is computed, not transcribed — and diverging from the pinned
contract tests is a loud signal, not a silent drift.

Usage:
  python scripts/rotation_plan.py          # check the CURRENT window
  python scripts/rotation_plan.py --next   # plan the NEXT window
                                           # (assumes the pending round
                                           # goes green over the current
                                           # window first)

Exit code 0 when the relevant window matches the derivation, 1 when it
diverges (each divergence printed).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod

WINDOW = 50
N_CORE = 13


def last_green_rounds() -> dict[str, int]:
    """query name -> latest round with a fully-green driver row."""
    last: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        for name, row in json.load(open(f)).items():
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                last[name] = max(last.get(name, 0), rnd)
    return last


def derive_window(priority: list[str], last: dict[str, int]) -> list[str]:
    """13 core + the 37 stalest (never-verified first, then oldest
    last-green, registry order breaking ties)."""
    core = priority[:N_CORE]
    rest = [n for n in priority if n not in core]
    pos = {n: i for i, n in enumerate(rest)}
    order = sorted(rest, key=lambda n: (last.get(n, -1), pos[n]))
    return core + order[: WINDOW - N_CORE]


def main() -> int:
    priority = list(entrymod.queries())
    last = last_green_rounds()
    current = priority[:WINDOW]

    never = [n for n in priority if n not in last]
    print(f"registry: {len(priority)} entries; never-driver-verified: {never or 0}")

    if "--next" in sys.argv:
        # plan mode: assume the pending round's driver run greens the
        # current window, then derive what the NEXT rotation must be
        for n in current:
            last[n] = max(last.values(), default=0) + 1
        derived = derive_window(priority, last)
        print("planned NEXT window, in order:")
        for i, n in enumerate(derived, 1):
            print(f"  {i:2d}. {n}")
        return 0

    # check mode: the CURRENT first-50 must BE the staleness derivation.
    # Exception (by design): entries PROMOTED mid-round sit at the
    # registry tail and join the pool at the NEXT rotation — so a
    # never-verified name outside the current window is excluded from
    # the check rather than flagged (it is exactly the r10-promotion
    # shape; anything never-verified INSIDE the window still must lead).
    pool = [
        n
        for i, n in enumerate(priority)
        if n in last or i < WINDOW
    ]
    derived = derive_window(pool, last)
    if derived == current:
        print("CURRENT window matches the staleness derivation (50/50)")
        return 0
    print("CURRENT window DIVERGES from the staleness derivation:")
    for i, (d, a) in enumerate(zip(derived, current), 1):
        if d != a:
            print(f"  slot {i}: derived={d}  pinned={a}")
    return 1


if __name__ == "__main__":
    import signal

    signal.signal(signal.SIGPIPE, signal.SIG_DFL)  # play nice with head/tail
    raise SystemExit(main())
