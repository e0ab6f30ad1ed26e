"""Shim for environments without the `wheel` package (offline sandboxes):
`pip install -e . --no-use-pep517 --no-build-isolation` takes the legacy
`setup.py develop` path, which needs no wheel build. All metadata lives in
pyproject.toml; modern environments install from it directly."""

from setuptools import setup

setup()
