"""Pipeline-orchestration layer — the reference's own surface (SURVEY.md §2
Part A), re-expressed Spark-first:

- spec.py      template catalog → local pipeline-spec registry (A3/A8/A9)
- ingest.py    CSV validation + typed PERMISSIVE ingest + quarantine (A5/A6)
- audit.py     four append-only JSONL audit channels (A13/A15)
- jobs.py      job submit/status/cancel for batch + streaming (A10-A12)
- http_sink.py retrying HTTP batch sink, per-partition (A7/A10)
- cli.py       upload/status/cancel/templates/template/help commands (A1/A2)
"""
