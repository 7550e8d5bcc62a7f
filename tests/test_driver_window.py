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
                ok = v.get("hash_match") or v.get("err") == "no_oracle"
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


def test_derivation_is_green_by_construction_for_future_rounds():
    """VERDICT r9 #6: the window is now DERIVED (plans/driver_window.py),
    so its correctness must hold for ANY future evidence state, not just
    the committed one. Simulate 8 future rounds: each round the driver
    writes green rows for the derived window, then we re-derive with an
    empty force list and assert every invariant this file checks —
    no-row coverage, bound staleness, rule (c), carryover cap, next-head
    consistency. A failure here means some evidence trajectory breaks
    the rotation arithmetic itself."""
    from binance_data_framework_spark.plans.driver_window import (
        derive_window,
        read_green_rows,
    )
    from binance_data_framework_spark.plans.registry import QUERIES

    names = list(QUERIES)
    newest, current = read_green_rows(REPO)
    bound = math.ceil(len(names) / WINDOW)
    prev_next_head: set[str] | None = None

    for rnd in range(current, current + 8):
        d = derive_window(names, newest, rnd)
        window = set(d.order)
        carry = set(d.carryover)
        assert len(d.order) == WINDOW and len(window) == WINDOW
        assert len(carry) <= WINDOW // 4
        assert not carry & window
        # rule (a): no-row queries in window
        assert all(q in window for q in names if q not in newest)
        # rule (b)+(c): nothing at/past the bound outside window ∪ carry
        for q in names:
            if q in newest and rnd - newest[q] >= bound:
                assert q in window or q in carry, (rnd, q, rnd - newest[q])
        # the previous round's declared next head must be honored
        if prev_next_head is not None:
            assert prev_next_head <= window, prev_next_head - window
        # due-next ⊆ next_head
        due_next = {
            q
            for q in names
            if q in newest and (rnd + 1) - newest[q] == bound and q not in window
        }
        assert due_next <= set(d.next_head)
        prev_next_head = set(d.next_head)
        # the driver runs: every window query gets a green row this round
        for q in d.order:
            newest[q] = rnd


def test_derivation_force_and_overflow_semantics():
    from binance_data_framework_spark.plans.driver_window import derive_window

    names = [f"q{i:03d}" for i in range(120)]
    bound = math.ceil(len(names) / WINDOW)  # 3
    current = 10
    # evenly aged evidence: ages 1 and 2 alternating
    newest = {q: current - 1 - (i % 2) for i, q in enumerate(names)}
    d = derive_window(names, newest, current, force=["q119"])
    assert "q119" in d.order  # forced in despite young age
    # forced queries outrank age-filled ones but not at-bound ones
    assert d.tiers["q119"] == 2
    # no-row queries are always in, ahead of everything
    newest2 = dict(newest)
    del newest2["q100"]
    d2 = derive_window(names, newest2, current)
    assert d2.order[0] == "q100" and d2.tiers["q100"] == 0
    # overflow: >50 at-bound queries with ages exactly at the bound spill
    # into carryover; past-bound spill raises
    newest3 = {q: current - bound for q in names[:60]}
    newest3.update({q: current - 1 for q in names[60:]})
    d3 = derive_window(names, newest3, current)
    assert len(d3.order) == WINDOW and len(d3.carryover) == 10
    assert set(d3.carryover) <= set(names[:60])
    assert set(d3.carryover) <= set(d3.next_head)
    newest4 = dict(newest3)
    for q in names[:60]:
        newest4[q] = current - bound - 1  # past the bound
    try:
        derive_window(names, newest4, current)
        assert False, "expected overflow with non-deferrable queries to raise"
    except ValueError as e:
        assert "non-deferrable" in str(e)
    # review r10 #2: forced (tier-2) queries crowded out of the window by
    # tiers 0+1 must SPILL to carryover ∪ next_head, never drop silently —
    # the protocol says a changed plan gets a fresh row, deferred at worst
    newest5 = {q: current - bound for q in names[:50]}  # 50 at-bound
    newest5.update({q: current - 1 for q in names[50:]})
    d5 = derive_window(names, newest5, current, force=["q110", "q111"])
    assert set(d5.carryover) == {"q110", "q111"}
    assert {"q110", "q111"} <= set(d5.next_head)
    assert not {"q110", "q111"} & set(d5.order)


def test_carryover_persists_across_rounds(tmp_path):
    """ADVICE r10 #2: a forced (tier-2) query spilled to carryover must be
    re-enqueued next round even though force is a per-round caller input
    that is re-authored from scratch — derive_from_repo persists the
    carryover next to the evidence files and unions it into the next
    derivation's force set."""
    from binance_data_framework_spark.plans.driver_window import (
        CARRYOVER_FILE,
        derive_from_repo,
    )

    names = [f"q{i:03d}" for i in range(120)]  # bound = ceil(120/50) = 3
    root = str(tmp_path)

    def _write(rnd, green):
        with open(os.path.join(root, f"CORRECTNESS_r{rnd}.json"), "w") as fh:
            json.dump({q: {"hash_match": True} for q in green}, fh)

    # rounds 1-3: 50 queries last green in r1 (age 3 = at-bound in round
    # 4), the rest green in r3
    stale = names[:50]
    _write(1, stale)
    _write(3, names[50:])

    forced = names[110:115]
    d = derive_from_repo(names, force=forced, repo_root=root)
    assert d.current_round == 4
    # 50 at-bound + 5 forced = 55 mandatory: the forced five spill
    assert d.carryover == forced
    assert set(d.order) == set(stale)
    sidecar = json.load(open(os.path.join(root, CARRYOVER_FILE)))
    assert sidecar == {
        "round": 4, "carryover": forced, "forced": sorted(forced)
    }

    # the driver records round 4 (greens the window), and round 5's force
    # list is re-authored WITHOUT the deferred five — the sidecar must
    # still force them into round 5's window
    _write(4, d.order)
    d2 = derive_from_repo(names, force=[], repo_root=root)
    assert d2.current_round == 5
    for q in forced:
        assert q in d2.order, f"deferred forced query {q} lost its row"
        assert d2.tiers[q] == 2
    # and the sidecar now reflects round 5's (empty) carryover, plus the
    # force union that produced round 5's window
    sidecar2 = json.load(open(os.path.join(root, CARRYOVER_FILE)))
    assert sidecar2 == {
        "round": 5, "carryover": [], "forced": sorted(forced)
    }

    # ADVICE r11 #2: a SECOND derivation in the same round (different
    # process, arbitrary import order) must produce the identical window —
    # the first call consumed the prior-round carryover, so the replay
    # comes from the sidecar's stored force union, not the (now gone)
    # carryover entry. The sidecar payload is unchanged, so no rewrite.
    mtime = os.path.getmtime(os.path.join(root, CARRYOVER_FILE))
    d2b = derive_from_repo(names, force=[], repo_root=root)
    assert d2b.order == d2.order
    for q in forced:
        assert q in d2b.order and d2b.tiers[q] == 2
    assert os.path.getmtime(os.path.join(root, CARRYOVER_FILE)) == mtime

    # unregistered carryover entries are dropped, not an error
    with open(os.path.join(root, CARRYOVER_FILE), "w") as fh:
        json.dump({"round": 4, "carryover": ["gone_query"]}, fh)
    d3 = derive_from_repo(names, force=[], repo_root=root)
    assert "gone_query" not in d3.order

    # a sidecar from two-or-more rounds back is stale: nothing to replay
    with open(os.path.join(root, CARRYOVER_FILE), "w") as fh:
        json.dump({"round": 2, "carryover": [names[119]]}, fh)
    d4 = derive_from_repo(names, force=[], repo_root=root)
    assert d4.tiers.get(names[119], 3) != 2
