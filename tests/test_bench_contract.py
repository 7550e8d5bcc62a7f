"""bench.py's driver contract (VERDICT r11 #8): the LAST stdout line must
be one complete JSON object small enough that the driver's ~2 KB stdout
tail always contains it whole — BENCH_r4..r10 all recorded `parsed: null`
because the full payload line outgrew the tail window; r11 fixed it by
printing a compact summary last, and this test keeps it fixed.

The summary builder is exercised directly (running the real bench at
sf0.1 is a multi-minute job the driver already runs per round); main()'s
final statement is pinned by source inspection so the builder cannot be
silently bypassed.
"""

from __future__ import annotations

import ast
import json
import os

import bench

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _worst_case_payload() -> dict:
    """A payload at least as large as any real run's: every registered
    query in both the headline map and the sweep."""
    from binance_data_framework_spark.plans.registry import QUERIES

    timings = {name: 12345.678 for name in QUERIES}
    return {
        "metric": "headline_queries_total_sec",
        "value": 12345.678,
        "unit": "sec",
        "queries": dict(timings),
        "sf": 0.1,
        "sweep": dict(timings),
        "sweep_total_sec": 12345.678,
        "sweep_build": dict(timings),
        "sweep_build_total_sec": 12345.678,
    }


def test_summary_line_parses_and_fits_tail_window():
    line = bench.summary_line(_worst_case_payload())
    assert "\n" not in line
    assert len(line.encode()) < 1024, f"{len(line)} bytes"
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_queries_total_sec"
    assert parsed["value"] == 12345.678 and parsed["unit"] == "sec"
    assert parsed["n_queries"] > 0
    assert "sweep_total_sec" in parsed and "sweep_build_total_sec" in parsed
    # headline-only runs (SPARK_GRAFT_SKIP_SWEEP) omit the sweep keys
    minimal = {
        k: v
        for k, v in _worst_case_payload().items()
        if not k.startswith("sweep")
    }
    assert json.loads(bench.summary_line(minimal))["value"] == 12345.678


def test_main_prints_summary_line_last():
    """The final statement of bench.main() must print summary_line(...) —
    anything printed after it would push the parseable summary out of the
    driver's tail window."""
    tree = ast.parse(open(os.path.join(REPO, "bench.py")).read())
    main_fn = next(
        n
        for n in tree.body
        if isinstance(n, ast.FunctionDef) and n.name == "main"
    )
    last = main_fn.body[-1]
    assert isinstance(last, ast.Expr) and isinstance(last.value, ast.Call)
    assert getattr(last.value.func, "id", None) == "print"
    arg = last.value.args[0]
    assert (
        isinstance(arg, ast.Call)
        and getattr(arg.func, "id", None) == "summary_line"
    ), "main() must end with print(summary_line(payload))"
