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
