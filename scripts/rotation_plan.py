"""Derive the driver-window rotation from first principles.

The rotation-by-staleness invariant (in force since r7, steady-state
contract pinned r10): every 50-entry driver window = the 13 pinned §2
core queries + the 37 stalest registry entries, never-driver-verified
first, then oldest last-green round, ties broken by current registry
order. Until r10 the windows were hand-enumerated and test-pinned; this
tool DERIVES them from the CORRECTNESS_r*.json history so the next
rotation is computed, not transcribed — and diverging from the pinned
contract tests is a loud signal, not a silent drift.

A pinned window lives through MULTIPLE history states (r10 verdict
task 1; generalized r12 after the single-strip variant broke twice —
the check must pass in all of them, or "pytest green" becomes
time-dependent on an artifact the builder does not control):

1. **as planned**: history = rounds 1..N (the window was derived from
   these records);
2. **greened k times, not yet rotated**: the driver lands one or MORE
   consecutive rounds whose records fully green the pinned window —
   each such round makes every window entry the freshest green, so the
   derivation over the full history yields the NEXT window, not the
   current one, until those trailing rounds are peeled off.

Check mode therefore strips CONSECUTIVE trailing rounds, but only
while the stripped round's record fully greens the pinned current
window (a round that does NOT green the window can never be the
"greened, awaiting rotation" state, so hitting one ends the walk); the
pinned window must match the derivation at some point of that walk.
Anything else is a real divergence.

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


def correctness_records() -> list[tuple[int, dict]]:
    """(round, record) for every CORRECTNESS_r*.json on disk, ascending."""
    recs = []
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        recs.append((rnd, json.load(open(f))))
    return sorted(recs)


def last_green_rounds(records: list[tuple[int, dict]]) -> dict[str, int]:
    """query name -> latest round with a fully-green driver row."""
    last: dict[str, int] = {}
    for rnd, rec in records:
        for name, row in rec.items():
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


def _derive_for_check(priority: list[str], last: dict[str, int]) -> list[str]:
    """Check-mode derivation. Exception (by design): entries PROMOTED
    mid-round sit at the registry tail and join the pool at the NEXT
    rotation — so a never-verified name outside the current window is
    excluded from the check rather than flagged (the r10/r11 promotion
    shape; anything never-verified INSIDE the window still must lead)."""
    pool = [n for i, n in enumerate(priority) if n in last or i < WINDOW]
    return derive_window(pool, last)


def _greens_window(rec: dict, window: list[str]) -> bool:
    """True when a single round's record fully greens every window entry."""
    green = last_green_rounds([(1, rec)])
    return all(n in green for n in window)


def check_current(
    priority: list[str], records: list[tuple[int, dict]]
) -> tuple[bool, str, list[str]]:
    """(ok, which-history-matched, derived-window) for the pinned
    current window. Walks backwards from the full history, peeling off
    trailing rounds — but ONLY rounds whose record fully greens the
    pinned window (the driver greening the current window one or more
    consecutive times before the rotation is spliced is a legitimate
    state; r10/r11 both tripped single-state variants of this check).
    The walk is bounded by len(records) and stops at the first
    non-greening round, so a genuinely divergent window cannot be
    vacuously matched by stripping unrelated history."""
    current = priority[:WINDOW]
    hist = sorted(records)
    stripped: list[int] = []
    first_derived: list[str] | None = None
    while True:
        derived = _derive_for_check(priority, last_green_rounds(hist))
        if first_derived is None:
            first_derived = derived
        if derived == current:
            if not stripped:
                return True, "full history", derived
            rs = "+".join(f"r{r}" for r in stripped)
            return (
                True,
                f"history minus {rs} (window greened, rotation not yet "
                "spliced)",
                derived,
            )
        if not hist or not _greens_window(hist[-1][1], current):
            return False, "none", first_derived
        stripped.insert(0, hist[-1][0])
        hist = hist[:-1]


def plan_next(priority: list[str], records: list[tuple[int, dict]]) -> list[str]:
    """The NEXT window, assuming the pending round greens the current
    one. The bump is a SINGLE shared synthetic round for all 50 entries
    (ties broken by registry order, per the documented contract)."""
    last = last_green_rounds(records)
    nxt = max(last.values(), default=0) + 1
    for n in priority[:WINDOW]:
        last[n] = nxt
    return derive_window(priority, last)


def main() -> int:
    priority = list(entrymod.queries())
    records = correctness_records()

    last = last_green_rounds(records)
    never = [n for n in priority if n not in last]
    print(f"registry: {len(priority)} entries; never-driver-verified: {never or 0}")

    if "--next" in sys.argv:
        derived = plan_next(priority, records)
        print("planned NEXT window, in order:")
        for i, n in enumerate(derived, 1):
            print(f"  {i:2d}. {n}")
        return 0

    ok, which, derived = check_current(priority, records)
    if ok:
        print(f"CURRENT window matches the staleness derivation ({which})")
        return 0
    print("CURRENT window DIVERGES from the staleness derivation:")
    for i, (d, a) in enumerate(zip(derived, priority[:WINDOW]), 1):
        if d != a:
            print(f"  slot {i}: derived={d}  pinned={a}")
    return 1


if __name__ == "__main__":
    import signal

    signal.signal(signal.SIGPIPE, signal.SIG_DFL)  # play nice with head/tail
    raise SystemExit(main())
