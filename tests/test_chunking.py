"""UDTF chunker must produce exactly the builtin-expression chunker's
output (same windows, same stride, same text)."""

from __future__ import annotations

from vena_etl_tool_spark.operators.textanalysis import (
    text_chunk_windows,
    udtf_chunk_text,
)


def test_udtf_equals_builtin_chunker(spark, sf_dir):
    builtin = {
        (r.doc_id, r.chunk_idx): r.chunk_text
        for r in text_chunk_windows(spark, sf_dir).collect()
    }
    via_udtf = {}
    for r in udtf_chunk_text(spark, sf_dir).collect():
        via_udtf[(r.doc_id, r.chunk_idx)] = r.chunk_text
    assert via_udtf == builtin
