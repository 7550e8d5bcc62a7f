"""Driver-window rotation arithmetic, enforced (VERDICT r6 #1: 9 queries
registered after the r6 rotation had no driver CORRECTNESS row in any
round — the window math was done by hand and missed them; this test
recomputes it from the committed evidence every run).

The external driver records the FIRST 50 entries of queries() per round
into CORRECTNESS_r{N}.json. Freshness invariant: with Q registered
queries cycled through a 50-row window, the sustainable cycle length is
ceil(Q / 50) rounds — every registered query must either
  (a) hold a green driver row at most ceil(Q/50) rounds old, or
  (b) sit in the CURRENT window (it gets its row when this round's
      driver runs), or
  (c) be declared in registry._FRESHNESS_CARRYOVER — age exactly at the
      bound, deferred to the NEXT round's window head; the list is
      size-capped so deferral cannot become the steady state.
Queries with NO row in any round get no grace at all: they must be in
the current window, full stop.
"""

from __future__ import annotations

import glob
import json
import math
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50


def _green_rows() -> tuple[dict[str, int], int]:
    """{query: newest green round}, current build round (= newest
    CORRECTNESS file + 1). Green = hash-matched, or a rows-only check for
    the by-design no-oracle queries."""
    newest: dict[str, int] = {}
    last = 0
    for f in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)\.json$", f).group(1))
        last = max(last, rnd)
        with open(f) as fh:
            for q, v in json.load(fh).items():
                ok = v.get("hash_match") or (
                    v.get("err") == "no_oracle" and not v.get("hash_match")
                )
                if ok:
                    newest[q] = max(newest.get(q, 0), rnd)
    return newest, last + 1


def test_driver_window_covers_unrowed_and_stale_queries():
    from binance_data_framework_spark.plans.registry import (
        _DRIVER_ORDER,
        _FRESHNESS_CARRYOVER,
        QUERIES,
    )

    newest, current = _green_rows()
    bound = math.ceil(len(QUERIES) / WINDOW)
    window = set(_DRIVER_ORDER)
    carry = set(_FRESHNESS_CARRYOVER)

    # structural invariants of the two lists
    assert len(_DRIVER_ORDER) == WINDOW
    assert window <= set(QUERIES)
    assert carry <= set(QUERIES)
    assert not carry & window, "a query cannot be both deferred and in-window"
    # deferral is a one-round escape valve, not a parallel track
    assert len(carry) <= WINDOW // 4, (
        f"{len(carry)} deferred queries — the carryover list is for the "
        f"handful that miss one rotation, not a second window"
    )
    # the driver records the first 50 of queries(): the window must BE the
    # first 50 in registration order
    assert list(QUERIES)[:WINDOW] == list(_DRIVER_ORDER)

    never_rowed = [q for q in QUERIES if q not in newest and q not in window]
    assert not never_rowed, (
        f"queries with NO driver row in any round and not in the current "
        f"window: {never_rowed}"
    )
    stale = {
        q: current - newest[q]
        for q in QUERIES
        if q in newest and q not in window and current - newest[q] > bound
    }
    over = {q: age for q, age in stale.items() if q not in carry}
    assert not over, (
        f"stale beyond the {bound}-round bound and neither in the window "
        f"nor declared carryover: {over}"
    )
    # carryover entries must be at exactly the bound (they MUST make the
    # next window or this test fails next round with age bound+1)
    for q in carry:
        age = current - newest.get(q, 0)
        assert age <= bound + 1, (
            f"carryover {q} is {age} rounds stale — it missed its deferred "
            f"slot; rotate it into the window now"
        )
    # rule (c), r9 (ADVICE r8 #3 — the machine-checked form of the old
    # comment-only "must head next round" promises): a query at age
    # EXACTLY the bound gets its last legal row THIS round — it must be
    # in the current window (or explicitly deferred via carryover), not
    # merely promised in prose. This is what forces the r9 head to honor
    # the r8 promise, and the r10 head to honor _NEXT_WINDOW_HEAD.
    at_bound = {
        q
        for q in QUERIES
        if q in newest and current - newest[q] == bound
    }
    missed = at_bound - window - carry
    assert not missed, (
        f"queries at the {bound}-round age bound but not in the current "
        f"window (their last legal round is NOW): {sorted(missed)}"
    )


def test_next_window_head_is_consistent():
    """_NEXT_WINDOW_HEAD (the declared start of the NEXT round's window)
    must name registered queries, be disjoint from the current window,
    and cover every query that will hit the age bound next round — so the
    next rotation starts from a checked list instead of prose arithmetic
    (ADVICE r8 #3)."""
    from binance_data_framework_spark.plans.registry import (
        _DRIVER_ORDER,
        _NEXT_WINDOW_HEAD,
        QUERIES,
    )

    newest, current = _green_rows()
    bound = math.ceil(len(QUERIES) / WINDOW)
    head = set(_NEXT_WINDOW_HEAD)
    assert head <= set(QUERIES)
    assert not head & set(_DRIVER_ORDER)
    # everything that will be at the bound at round current+1 and is not
    # getting a row this round must be declared
    due_next = {
        q
        for q in QUERIES
        if q in newest
        and (current + 1) - newest[q] == bound
        and q not in set(_DRIVER_ORDER)
    }
    assert due_next <= head, (
        f"age-bound-next-round queries missing from _NEXT_WINDOW_HEAD: "
        f"{sorted(due_next - head)}"
    )
