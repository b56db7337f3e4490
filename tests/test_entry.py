"""Smoke tests for the driver contract surface (__spark_entry__.py)."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert len(df.columns) >= 2


def test_every_oracle_key_has_query():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 1


def test_cli_list_and_unknown_query():
    """The engine CLI lists the registry and fails helpfully on typos —
    without starting a SparkSession for either path."""
    import contextlib
    import io

    from vena_etl_tool_spark.__main__ import main

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert main(["list", "drift"]) == 0
    assert "corpus_drift_topk" in buf.getvalue()
    err = io.StringIO()
    with contextlib.redirect_stderr(err):
        assert main(["run", "corpus_drift_topkk"]) == 2
    assert "did you mean" in err.getvalue()
