"""Setuptools shim (metadata lives in pyproject.toml).

Kept for two reasons: reference parity — the reference ships a setup.py
as its install story (reference setup.py:6-30) — and practicality: it
enables pip's legacy editable path (``pip install -e . --no-use-pep517``)
on environments whose setuptools predates PEP 660 wheel-less editables,
like hermetic clusters pinning setuptools<70 without the ``wheel``
package.
"""

from setuptools import setup

setup()
