"""Driver-certification staleness ledger (VERDICT r9 item 2).

The driver's correctness harness certifies only the FIRST 50 entries of
``__spark_entry__.queries()`` each round; ``_R{N}_DRIVER_WINDOW`` rotates
that window so no contract row's latest certification goes stale.  Rounds
1-9 maintained the rotation ledger as hand-written prose in NOTES_r*.md —
one slip would silently break the <=5-round staleness bound.  This script
IS the ledger: it recomputes per-row last-certified round from the
CORRECTNESS_r*.json union and emits the next window's mandatory catch-up
list, deterministically ordered (staleness-descending, then name).

"Certified" means the driver recorded ``rows_match``, ``schema_match``
AND ``hash_match`` all true for the row in some round (the strict
oracle-green definition; rows-only ``no_oracle`` entries and hash misses
do not count).

Usage:
    python scripts/staleness.py [--repo DIR] [--round N] [--bound 5]
                                [--json]

Output (human mode): one line per never-certified / stale row, then a
summary histogram.  ``--json`` emits a machine-readable dict consumed by
tests/test_driver_window.py, which asserts the committed window actually
contains every row at or beyond the staleness bound.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys
from collections import Counter


def correctness_files(repo: str) -> list[tuple[int, str]]:
    out = []
    for path in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if m:
            out.append((int(m.group(1)), path))
    return sorted(out)


def certified_rounds(repo: str) -> tuple[dict[str, int], int]:
    """Per-row latest strictly-green driver round, and the latest round
    number seen on disk (0 if none)."""
    last: dict[str, int] = {}
    latest = 0
    for rnd, path in correctness_files(repo):
        latest = max(latest, rnd)
        with open(path) as fh:
            data = json.load(fh)
        for name, res in data.items():
            if not isinstance(res, dict):
                continue
            if (
                res.get("rows_match") is True
                and res.get("schema_match") is True
                and res.get("hash_match") is True
            ):
                last[name] = max(last.get(name, 0), rnd)
    return last, latest


#: entries the driver's correctness harness certifies per round (it
#: checks the FIRST 50 of queries())
WINDOW_SLOTS = 50

#: the flagship row leads every window by convention
FLAGSHIP = "validate_lineitem"


def ledger(
    repo: str, next_round: int | None = None, bound: int = 5,
    window: int = WINDOW_SLOTS,
) -> dict:
    """Compute the rotation ledger for ``next_round``.

    Returns a dict with:
      next_round     the round the window is being built for
      last_certified {row: round} strict-green latest certification
      contract_rows  every row currently in queries() (import side effect:
                     needs the repo on sys.path; falls back to certified
                     rows if the import fails, e.g. no pyspark)
      never_certified rows in queries() with no green record at all
      mandatory      rows that would EXCEED the staleness bound after
                     next_round if not re-certified (last certification
                     < next_round - bound), ordered oldest-first then
                     name.  The invariant each round preserves is
                     "after round N, every row's staleness N - last is
                     <= bound" — r4 rows at r9 sat exactly AT the bound
                     and were legal, but lead the r10 mandatory list.
      next_oldest    rows exactly at the bound (the filler pool: pulling
                     them forward keeps the next round's mandatory list
                     small)
      histogram      {last_round: n_rows}
      capacity       contract-size management (VERDICT r10 item 3): with
                     ``window`` driver slots per round and a re-cert
                     cycle of ``bound + 1`` rounds, the steady-state
                     ceiling is ``window * (bound + 1)`` rows.  Reports
                     rows vs ceiling, the per-round steady-state
                     re-certification load ``ceil(rows / (bound+1))``,
                     the max SUSTAINABLE net-new per round
                     (``window - recert_load``, what the contract can
                     absorb indefinitely), and this round's actual free
                     slots after flagship + mandatory + never-certified.
    """
    last, latest = certified_rounds(repo)
    if next_round is None:
        next_round = latest + 1

    contract_rows = None
    try:
        sys.path.insert(0, repo)
        import __spark_entry__ as entry  # noqa: PLC0415

        contract_rows = sorted(entry._queries_unordered().keys())
    except Exception:
        contract_rows = sorted(last)
    finally:
        if sys.path and sys.path[0] == repo:
            sys.path.pop(0)

    never = sorted(k for k in contract_rows if k not in last)
    cutoff = next_round - bound - 1  # last <= cutoff would exceed bound
    mandatory = sorted(
        (k for k in contract_rows if k in last and last[k] <= cutoff),
        key=lambda k: (last[k], k),
    )
    filler = sorted(
        (k for k in contract_rows if last.get(k) == cutoff + 1),
        key=lambda k: (last[k], k),
    )
    rows = len(contract_rows)
    cycle = bound + 1
    recert_load = -(-rows // cycle)  # ceil
    reserved = len(mandatory) + len(never)
    if FLAGSHIP in contract_rows and FLAGSHIP not in mandatory \
            and FLAGSHIP not in never:
        reserved += 1
    capacity = {
        "window_slots": window,
        "recert_cycle_rounds": cycle,
        "ceiling_rows": window * cycle,
        "rows": rows,
        "headroom_rows": window * cycle - rows,
        "steady_state_recert_per_round": recert_load,
        "max_sustainable_net_new": max(0, window - recert_load),
        "free_slots_this_round": max(0, window - reserved),
    }
    return {
        "next_round": next_round,
        "bound": bound,
        "last_certified": last,
        "contract_rows": contract_rows,
        "never_certified": never,
        "mandatory": mandatory,
        "next_oldest": filler,
        "histogram": dict(sorted(Counter(last.values()).items())),
        "capacity": capacity,
    }


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--repo", default=os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))
    )
    ap.add_argument("--round", type=int, default=None,
                    help="round the window is for (default: latest+1)")
    ap.add_argument("--bound", type=int, default=5)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    led = ledger(args.repo, args.round, args.bound)
    if args.json:
        print(json.dumps(led, indent=1, sort_keys=True))
        return
    print(f"rotation ledger for round r{led['next_round']} "
          f"(bound: {led['bound']} rounds)")
    print(f"histogram of last-certified rounds: {led['histogram']}")
    cap = led["capacity"]
    print(
        f"capacity: {cap['rows']} rows / ceiling "
        f"{cap['ceiling_rows']} ({cap['window_slots']} slots x "
        f"{cap['recert_cycle_rounds']}-round re-cert cycle) — headroom "
        f"{cap['headroom_rows']} rows; steady-state re-cert load "
        f"{cap['steady_state_recert_per_round']}/round => max "
        f"SUSTAINABLE net-new {cap['max_sustainable_net_new']}/round; "
        f"free slots this round (after flagship + mandatory + "
        f"never-certified): {cap['free_slots_this_round']}"
    )
    if led["never_certified"]:
        print(f"\nNEVER certified ({len(led['never_certified'])}) — "
              "highest priority:")
        for k in led["never_certified"]:
            print(f"  {k}")
    print(f"\nmandatory catch-up ({len(led['mandatory'])}) — last "
          f"certified <= r{led['next_round'] - led['bound'] - 1}:")
    for k in led["mandatory"]:
        print(f"  r{led['last_certified'][k]}  {k}")
    print(f"\nfiller pool ({len(led['next_oldest'])}) — at the bound, "
          f"last certified r{led['next_round'] - led['bound']}:")
    for k in led["next_oldest"]:
        print(f"  r{led['last_certified'][k]}  {k}")


if __name__ == "__main__":
    main()
