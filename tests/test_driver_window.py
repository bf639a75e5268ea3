"""Driver-window rotation invariants (VERDICT r9 item 2).

The rotation ledger used to be hand-maintained prose in NOTES_r*.md;
one slip would silently break the <=5-round staleness bound.  These
tests pin the COMMITTED ``_R10_DRIVER_WINDOW`` against the computed
ledger (scripts/staleness.py over the CORRECTNESS_r*.json union):

- every row that would exceed the bound after this round is in the
  window (the "mandatory" list);
- the window is exactly the driver's 50 certification slots, leads
  with the flagship, contains no unknown or duplicate names;
- never-certified rows (new this round) are all present — a new
  contract row that never enters the window would never get driver
  evidence.

No Spark session needed — this is pure bookkeeping over JSON.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

import __spark_entry__ as entry  # noqa: E402
from staleness import certified_rounds, ledger  # noqa: E402

ROUND = 11
BOUND = 5
WINDOW = entry._R11_DRIVER_WINDOW


def test_window_is_exactly_the_driver_slot_count():
    assert len(WINDOW) == 50
    assert len(set(WINDOW)) == 50


def test_window_leads_with_flagship():
    assert WINDOW[0] == "validate_lineitem"


def test_window_names_are_known_queries():
    known = set(entry._queries_unordered())
    unknown = [k for k in WINDOW if k not in known]
    assert not unknown, unknown


def test_queries_order_puts_window_first():
    ordered = list(entry.queries())
    assert ordered[:50] == WINDOW


def test_every_mandatory_row_is_in_the_window():
    led = ledger(REPO, next_round=ROUND, bound=BOUND)
    missing = [k for k in led["mandatory"] if k not in set(WINDOW)]
    assert not missing, (
        f"rows exceeding the {BOUND}-round staleness bound after "
        f"r{ROUND} are absent from _R{ROUND}_DRIVER_WINDOW: {missing}"
    )


def test_every_never_certified_row_is_in_the_window():
    last, _ = certified_rounds(REPO)
    never = [
        k for k in entry._queries_unordered() if k not in last
    ]
    missing = [k for k in never if k not in set(WINDOW)]
    assert not missing, (
        f"never-driver-certified rows absent from the window: {missing}"
    )


def test_ledger_shape_sane():
    led = ledger(REPO, next_round=ROUND, bound=BOUND)
    # r1..r9 history is committed: 251 rows certified, histogram keys
    # within the played rounds
    assert len(led["last_certified"]) >= 251
    assert all(1 <= r <= ROUND for r in led["histogram"])


def test_capacity_readout_consistent():
    led = ledger(REPO, next_round=ROUND, bound=BOUND)
    cap = led["capacity"]
    rows = len(led["contract_rows"])
    assert cap["rows"] == rows
    assert cap["ceiling_rows"] == cap["window_slots"] * (BOUND + 1)
    assert cap["headroom_rows"] == cap["ceiling_rows"] - rows
    assert cap["max_sustainable_net_new"] == max(
        0, cap["window_slots"] - (-(-rows // (BOUND + 1)))
    )
    # the r11 window respects the sustainable bound: net-new this
    # round (never-certified rows in the window) <= the sustainable
    # rate at the PRE-round contract size (the readout the builder
    # saw when deciding how many rows to add)
    never = set(led["never_certified"])
    net_new = len([k for k in WINDOW if k in never])
    pre_rows = rows - len(never)
    pre_sustainable = max(
        0, cap["window_slots"] - (-(-pre_rows // (BOUND + 1)))
    )
    assert net_new <= pre_sustainable


def test_contract_stays_under_ceiling():
    led = ledger(REPO, next_round=ROUND, bound=BOUND)
    cap = led["capacity"]
    assert cap["rows"] <= cap["ceiling_rows"], (
        "contract exceeds the re-certification ceiling — retire or "
        "merge rows before adding more"
    )
