"""Packaging parity (VERDICT r10 #6; reference setup.py:6-30): the repo is
pip-installable. The full `pip install -e .` needs the `wheel` package (or
network for build isolation) which hermetic containers may lack — in that
case the editable-install test SKIPS with the reason, and the metadata/
discovery checks below still run: they catch every packaging regression
short of the final wheel assembly (missing package dirs, test leakage,
broken pyproject)."""

from __future__ import annotations

import pathlib
import shutil
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent


def test_package_metadata_builds_and_discovers_only_the_package(tmp_path):
    """`setup.py egg_info` exercises pyproject parsing + package discovery
    without needing wheel: the one top-level package is the engine, tests/
    tools/ fixtures never leak into SOURCES."""
    out = subprocess.run(
        [sys.executable, "setup.py", "egg_info", "--egg-base", str(tmp_path)],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    egg = next(tmp_path.glob("*.egg-info"))
    top = (egg / "top_level.txt").read_text().split()
    assert top == ["binance_data_framework_spark"]
    sources = (egg / "SOURCES.txt").read_text().splitlines()
    assert not any(s.startswith(("tests/", "tools/", "_scratch/")) for s in sources)
    assert sum(s.startswith("binance_data_framework_spark/") for s in sources) > 30


def test_editable_install_and_import(tmp_path):
    """Full `pip install -e .` + import from OUTSIDE the repo dir — the
    real user install story. Skipped (with the exact reason) where the
    environment cannot assemble editable wheels at all."""
    import pytest

    try:
        import wheel  # noqa: F401

        have_wheel = True
    except ImportError:
        have_wheel = False
    if not have_wheel:
        pytest.skip(
            "environment lacks the `wheel` package and has no network for "
            "pip build isolation — editable wheel assembly impossible here; "
            "metadata/discovery verified by the sibling test"
        )
    target = tmp_path / "site"
    target.mkdir()
    out = subprocess.run(
        [
            sys.executable, "-m", "pip", "install", "-e", str(REPO),
            "--no-deps", "--no-build-isolation", "--quiet",
            "--prefix", str(target),
        ],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lib = next(target.glob("lib/python*/site-packages"))
    chk = subprocess.run(
        [sys.executable, "-c", "import binance_data_framework_spark"],
        cwd=tmp_path,
        env={"PYTHONPATH": str(lib), "PATH": "/usr/bin:/bin"},
        capture_output=True,
        text=True,
        timeout=60,
    )
    assert chk.returncode == 0, chk.stderr[-2000:]
