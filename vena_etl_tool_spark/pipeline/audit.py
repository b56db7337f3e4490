"""Append-only JSONL audit channels.

Reference parity: four channels (upload-history, job-history, api-history,
error), each record `{timestamp: ISO-8601, ...payload}` appended as one
JSON line (/root/reference/src/utils/logging.js:12-73; file names from
src/config.js:19-24). Control-plane records are tiny, so driver-side
appends are correct; data-plane audit tables go through
``audit_frame_writer`` (distributed ``df.write.json`` append) instead.
"""

from __future__ import annotations

import json
import os
import threading
from datetime import datetime, timezone

from pyspark.sql import DataFrame

CHANNELS = ("upload-history", "job-history", "api-history", "error")


class AuditLog:
    def __init__(self, log_dir: str) -> None:
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)  # mkdir-p, logging.js:12-17
        self._lock = threading.Lock()

    def _append(self, channel: str, data: dict) -> dict:
        record = {"timestamp": datetime.now(timezone.utc).isoformat(), **data}
        path = os.path.join(self.log_dir, f"{channel}.jsonl")
        with self._lock, open(path, "a", encoding="utf-8") as f:
            f.write(json.dumps(record, default=str) + "\n")
        return record

    # the four channels, logging.js:23-31, 37-45, 51-59, 65-73
    def log_upload(self, data: dict) -> dict:
        return self._append("upload-history", data)

    def log_job_operation(self, data: dict) -> dict:
        return self._append("job-history", data)

    def log_api_operation(self, data: dict) -> dict:
        return self._append("api-history", data)

    def log_error(self, data: dict) -> dict:
        return self._append("error", data)

    def read_channel(self, channel: str) -> list[dict]:
        path = os.path.join(self.log_dir, f"{channel}.jsonl")
        if not os.path.exists(path):
            return []
        with open(path, encoding="utf-8") as f:
            return [json.loads(line) for line in f if line.strip()]


def audit_frame_writer(df: DataFrame, path: str) -> None:
    """Data-plane audit sink: distributed JSONL append with the same
    record shape (timestamp column injected)."""
    import pyspark.sql.functions as F

    df.withColumn("timestamp", F.current_timestamp()).write.mode("append").json(path)
