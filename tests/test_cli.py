"""Batch CLI smoke tests (mrcond_spark/__main__.py)."""

from __future__ import annotations

from mrcond_spark.__main__ import main


def test_cli_list(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "q10_agg_tpch_q1" in out and "oracle" in out


def test_cli_run_and_sql(spark, sf_dir, capsys):
    assert main(["run", "q01_scan_project", "--sf", sf_dir, "--limit", "3"]) == 0
    assert "AFRICA" in capsys.readouterr().out
    assert main(["run", "no_such_query"]) == 2
    assert main(["sql", "SELECT COUNT(*) AS n FROM region", "--sf", sf_dir]) == 0
    assert "5" in capsys.readouterr().out


def test_packaging_entry_points():
    """pyproject.toml's [project.scripts] must reference importable callables
    (the reference ships a library + daemon dual surface; ours installs as
    `mrcond-spark` -> daemon.main and `mrcond-spark-batch` -> __main__.main)."""
    import importlib
    import pathlib

    import pytest

    # tomllib is 3.11+; the package supports 3.10, where this check (not the
    # packaging itself) is simply skipped
    tomllib = pytest.importorskip("tomllib")

    with open(pathlib.Path(__file__).parent.parent / "pyproject.toml", "rb") as f:
        scripts = tomllib.load(f)["project"]["scripts"]
    assert set(scripts) == {"mrcond-spark", "mrcond-spark-batch"}
    for target in scripts.values():
        mod, _, attr = target.partition(":")
        assert callable(getattr(importlib.import_module(mod), attr))
