"""Job lifecycle: submit / status / cancel for batch and streaming.

Reference parity: a Vena job is an async server-side execution with an id,
polled via two GETs and cancelled via POST
(/root/reference/src/api/jobs.js:25-35 status, :66-103 cancel; created by
the upload at src/api/templates.js:157-160). Spark-first mapping:

- batch action  → run under a job *tag* (session-level ``addTag`` — the
  PySpark-4 unified API that works on BOTH classic and Spark Connect
  sessions, unlike the SparkContext job-group/`addJobTag` APIs it
  replaces); cancel = ``interruptTag`` (async, like the reference's
  cancel endpoint).
- streaming     → the ``StreamingQuery`` handle natively carries
  id/status/lastProgress/stop — the exact analog of the job object, and
  is itself Connect-compatible.

Connect note (SCALE.md §connect): only ``setJobDescription`` remains a
classic-only nicety here; it is guarded and skipped under Connect.
"""

from __future__ import annotations

import threading
import uuid
from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from .audit import AuditLog


@dataclass
class JobHandle:
    job_id: str
    kind: str  # "batch" | "stream"
    state: str = "RUNNING"
    result: Any = None
    error: str | None = None
    query: StreamingQuery | None = None
    thread: threading.Thread | None = field(default=None, repr=False)


class JobRegistry:
    def __init__(self, spark: SparkSession, audit: AuditLog | None = None) -> None:
        self.spark = spark
        self.audit = audit
        self._jobs: dict[str, JobHandle] = {}

    # --- submit (reference: POST /startWithFile returns {jobId}) ---------
    def submit_batch(self, fn: Callable[[], Any], description: str = "") -> JobHandle:
        """Run a batch action asynchronously under its own job group so it
        can be observed and cancelled by id."""
        job_id = uuid.uuid4().hex[:12]
        handle = JobHandle(job_id=job_id, kind="batch")

        def runner() -> None:
            self.spark.addTag(job_id)  # session-level: classic AND Connect
            try:  # description is a UI nicety; no Connect equivalent
                self.spark.sparkContext.setJobDescription(description or job_id)
            except Exception:  # noqa: BLE001 — Connect session: skip
                pass
            try:
                handle.result = fn()
                handle.state = "SUCCEEDED"
            except Exception as e:  # noqa: BLE001 — job failure is data, not a crash
                handle.error = f"{type(e).__name__}: {e}"
                handle.state = "CANCELLED" if "cancelled" in str(e).lower() else "FAILED"
            finally:
                self.spark.removeTag(job_id)

        handle.thread = threading.Thread(target=runner, daemon=True)
        handle.thread.start()
        self._jobs[job_id] = handle
        if self.audit:
            self.audit.log_job_operation({"operation": "submit", "jobId": job_id, "kind": "batch"})
        return handle

    def register_stream(self, query: StreamingQuery) -> JobHandle:
        handle = JobHandle(job_id=query.id, kind="stream", query=query)
        self._jobs[query.id] = handle
        if self.audit:
            self.audit.log_job_operation({"operation": "submit", "jobId": query.id, "kind": "stream"})
        return handle

    # --- status (reference: GET /jobs/{id} + /jobs/{id}/status) ----------
    def status(self, job_id: str) -> dict:
        handle = self._get(job_id)
        if handle.kind == "stream" and handle.query is not None:
            q = handle.query
            details = {
                "isActive": q.isActive,
                "status": q.status,
                "lastProgress": q.lastProgress,
            }
            state = "RUNNING" if q.isActive else "FINISHED"
        else:
            details = {"error": handle.error}
            state = handle.state
        out = {"jobId": job_id, "kind": handle.kind, "state": state, "details": details}
        if self.audit:
            self.audit.log_job_operation({"operation": "status", "jobId": job_id, "state": state})
        return out

    # --- cancel (reference: POST /jobs/{id}/cancel) -----------------------
    def cancel(self, job_id: str) -> dict:
        handle = self._get(job_id)
        if handle.kind == "stream" and handle.query is not None:
            handle.query.stop()
            handle.state = "CANCELLED"
        else:
            self.spark.interruptTag(job_id)  # session-level: classic AND Connect
            handle.state = "CANCELLED"
        if self.audit:
            self.audit.log_job_operation({"operation": "cancel", "jobId": job_id})
        return {"jobId": job_id, "state": handle.state}

    def wait(self, job_id: str, timeout: float | None = None) -> JobHandle:
        handle = self._get(job_id)
        if handle.thread is not None:
            handle.thread.join(timeout)
        return handle

    def _get(self, job_id: str) -> JobHandle:
        try:
            return self._jobs[job_id]
        except KeyError:
            raise KeyError(f"unknown job: {job_id!r}") from None
