"""Async job manager with live progress polling.

The reference runs index mutations as background jobs polled over HTTP
(/root/reference/internal/jobs/manager.go:17-34 Job registry,
:113-172 progress updates + polling; model/job.go:33-51 the Job shape).
Here jobs are driver-side threads around Spark actions: Spark handles
the distributed execution; this registry only tracks status/progress so
a client can POST a bulk index and poll GET /jobs/{id} exactly like the
reference's async document operations (api/async_handlers.go).

In-process by design (the reference's manager is, too). Progress flows
from the builder's per-shard checkpoint commits via the ``progress``
callback each job function receives.
"""

from __future__ import annotations

import threading
import time
import traceback
import uuid
from dataclasses import dataclass, field


@dataclass
class Job:
    id: str
    type: str
    index_name: str
    status: str = "pending"  # pending | running | completed | failed
    progress_current: int = 0
    progress_total: int = 0
    progress_message: str = ""
    error: str | None = None
    traceback: str | None = None
    result: dict | None = None
    created_at: float = field(default_factory=time.time)
    started_at: float | None = None
    completed_at: float | None = None

    def to_dict(self, debug: bool = False) -> dict:
        out = {
            "id": self.id,
            "type": self.type,
            "index_name": self.index_name,
            "status": self.status,
            "progress": {
                "current": self.progress_current,
                "total": self.progress_total,
                "message": self.progress_message,
            },
            "error": self.error,
            "result": self.result,
            "created_at": self.created_at,
            "started_at": self.started_at,
            "completed_at": self.completed_at,
        }
        if debug:
            # full stack only when explicitly enabled: the job endpoints
            # are unauthenticated/CORS-*, and the reference exposes only
            # the error string (model/job.go:33-51) -- server file paths
            # and frame internals stay out of the default payload (the
            # stack is always logged server-side at failure time)
            out["traceback"] = self.traceback
        return out


class JobManager:
    """Registry + executor for background jobs (manager.go:17-34).

    ``submit(type, index, fn)`` runs ``fn(progress)`` on a daemon thread;
    ``fn`` may call ``progress(current, total, message)`` at any time
    (the builder calls it per shard commit) and its return dict becomes
    ``job.result``. Jobs are kept for polling; ``prune`` drops finished
    jobs older than ``max_age_sec`` (the reference caps its registry the
    same way, manager.go:176-198).
    """

    def __init__(self):
        self._jobs: dict[str, Job] = {}
        self._lock = threading.Lock()

    def submit(self, job_type: str, index_name: str, fn) -> str:
        job = Job(id=uuid.uuid4().hex[:16], type=job_type, index_name=index_name)
        with self._lock:
            self._jobs[job.id] = job

        def progress(current: int, total: int, message: str = "") -> None:
            job.progress_current = int(current)
            job.progress_total = int(total)
            job.progress_message = str(message)

        def run() -> None:
            job.status = "running"
            job.started_at = time.time()
            try:
                job.result = fn(progress)
                job.status = "completed"
            except Exception as e:  # surfaced to the poller, never lost
                # status LAST: it is the poller's readiness flag, and a
                # poll landing between the flip and the error/traceback
                # assignments would see a failed job with no diagnostics
                job.error = f"{type(e).__name__}: {e}"
                job.traceback = traceback.format_exc()
                import logging

                logging.getLogger(__name__).error(
                    "job %s (%s/%s) failed:\n%s",
                    job.id, job.type, job.index_name, job.traceback,
                )
                job.status = "failed"
            finally:
                job.completed_at = time.time()

        threading.Thread(target=run, daemon=True).start()
        return job.id

    def get(self, job_id: str) -> Job | None:
        with self._lock:
            return self._jobs.get(job_id)

    def list(self, index_name: str | None = None,
             status: str | None = None) -> list[Job]:
        with self._lock:
            jobs = list(self._jobs.values())
        if index_name is not None:
            jobs = [j for j in jobs if j.index_name == index_name]
        if status is not None:
            jobs = [j for j in jobs if j.status == status]
        return sorted(jobs, key=lambda j: j.created_at)

    def wait(self, job_id: str, timeout: float = 300.0) -> Job:
        """Poll until the job finishes (test/CLI convenience)."""
        deadline = time.time() + timeout
        while time.time() < deadline:
            job = self.get(job_id)
            if job is None:
                raise KeyError(job_id)
            if job.status in ("completed", "failed"):
                return job
            time.sleep(0.05)
        raise TimeoutError(f"job {job_id} still {self.get(job_id).status}")

    def prune(self, max_age_sec: float = 3600.0) -> int:
        cutoff = time.time() - max_age_sec
        with self._lock:
            dead = [
                jid for jid, j in self._jobs.items()
                if j.status in ("completed", "failed")
                and (j.completed_at or 0) < cutoff
            ]
            for jid in dead:
                del self._jobs[jid]
        return len(dead)
