"""CLI surface: list works sparkless; run/sql share the engine session."""

from __future__ import annotations

from research_data_pipeline_spark.cli import main


def test_cli_list(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "q01_pricing_summary" in out and "(oracle)" in out


def test_cli_unknown_query(capsys, spark):
    assert main(["run", "nope"]) == 2
