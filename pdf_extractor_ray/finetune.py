"""Fine-tune job lifecycle (offline analog).

Rebuilds the reference's training-job surface — create a job from a
training file, monitor it to a terminal state, query status, list jobs
and models (``fine_tuning/trainer.py:21-55``,
``finetune_commands/status.py:9-37``, ``list_jobs.py:10-34``,
``list_models.py:9-40``) — against a pluggable backend, the same
swap-point pattern as ``stages/scorer.py``: wire a real service client
by implementing ``FineTuneBackend``; the shipped
``LocalSimulatedBackend`` is a deterministic on-disk registry (no
network in this environment) whose jobs progress
``validating_files → running → succeeded`` one state per poll, so the
monitor loop, terminal-state handling, and failure paths are all
exercisable and tested.

Job admission enforces the reference's pre-flight rules: the training
file must be readable JSONL of chat examples and carry at least
``MIN_TRAINING_EXAMPLES`` valid rows (``train.py:277-281``) — rejected
submissions become jobs born in ``failed`` with the reason recorded,
mirroring service-side validation failures.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from abc import ABC, abstractmethod
from pathlib import Path

from pdf_extractor_ray.pipelines.training import MIN_TRAINING_EXAMPLES

TERMINAL_STATES = frozenset({"succeeded", "failed", "cancelled"})
_PROGRESSION = ["validating_files", "running", "succeeded"]


class FineTuneBackend(ABC):
    """Service boundary for the fine-tune lifecycle."""

    @abstractmethod
    def create_job(self, training_file: str, base_model: str, suffix: str) -> str: ...

    @abstractmethod
    def retrieve_job(self, job_id: str) -> dict: ...

    @abstractmethod
    def list_jobs(self, limit: int | None = None) -> list[dict]: ...

    @abstractmethod
    def list_models(self) -> list[str]: ...


def _count_valid_examples(training_file: str) -> tuple[int, str]:
    """(n_valid, error) for a JSONL training file — each line must be
    an object with a non-empty ``messages`` list."""
    n = 0
    try:
        with open(training_file) as f:
            for i, line in enumerate(f):
                if not line.strip():
                    continue
                try:
                    obj = json.loads(line)
                except json.JSONDecodeError as e:
                    return n, f"line {i + 1}: invalid JSON: {e}"
                if not isinstance(obj, dict) or not obj.get("messages"):
                    return n, f"line {i + 1}: missing messages"
                n += 1
    except OSError as e:
        return 0, f"unreadable training file: {e}"
    return n, ""


class LocalSimulatedBackend(FineTuneBackend):
    """Deterministic on-disk job registry. Each ``retrieve_job`` call
    advances a non-terminal job one state (validating_files → running →
    succeeded), so ``monitor_job`` terminates without wall-clock
    dependence and tests are instant."""

    def __init__(self, registry_dir: str) -> None:
        self.dir = Path(registry_dir)
        self.dir.mkdir(parents=True, exist_ok=True)

    def _path(self, job_id: str) -> Path:
        return self.dir / f"{job_id}.json"

    def _write(self, job: dict) -> None:
        self._path(job["id"]).write_text(json.dumps(job, indent=1))

    def create_job(self, training_file: str, base_model: str, suffix: str) -> str:
        n_valid, err = _count_valid_examples(training_file)
        if not err and n_valid < MIN_TRAINING_EXAMPLES:
            err = f"needs >= {MIN_TRAINING_EXAMPLES} valid examples, got {n_valid}"
        try:
            file_hash = hashlib.blake2b(
                Path(training_file).read_bytes(), digest_size=4
            ).hexdigest()
        except OSError:
            file_hash = "unread"
        # every submission is a NEW job (sequence suffix), matching the
        # reference service — resubmitting from the same path must not
        # overwrite the previous job record (the O_EXCL create below
        # guarantees it even for two CONCURRENT submissions of the same
        # file, which would otherwise derive the same hash and seq)
        seq = len(list(self.dir.glob("ftjob-*.json")))
        job_id = f"ftjob-{file_hash}-{seq:04d}"
        job = {
            "id": job_id,
            "status": "failed" if err else _PROGRESSION[0],
            "model": base_model,
            "suffix": suffix,
            "training_file": os.path.abspath(training_file),
            "n_examples": n_valid,
            "error": err,
            "fine_tuned_model": None,
            "created_at": time.time(),
            "finished_at": None,
            "polls": 0,
        }
        while not self._create_exclusive(job):
            seq += 1
            job["id"] = job_id = f"ftjob-{file_hash}-{seq:04d}"
        return job_id

    def _create_exclusive(self, job: dict) -> bool:
        """Atomically claim the job id: O_CREAT|O_EXCL create fails on
        EEXIST instead of overwriting a concurrent submitter's record."""
        try:
            fd = os.open(self._path(job["id"]), os.O_CREAT | os.O_EXCL | os.O_WRONLY, 0o644)
        except FileExistsError:
            return False
        with os.fdopen(fd, "w") as f:
            json.dump(job, f, indent=1)
        return True

    def retrieve_job(self, job_id: str) -> dict:
        p = self._path(job_id)
        if not p.exists():
            raise ValueError(f"no such job: {job_id}")
        job = json.loads(p.read_text())
        if job["status"] not in TERMINAL_STATES:
            job["polls"] += 1
            step = min(job["polls"], len(_PROGRESSION) - 1)
            job["status"] = _PROGRESSION[step]
            if job["status"] == "succeeded":
                job["fine_tuned_model"] = f"ft:{job['model']}:{job['suffix']}:{job['id'][-6:]}"
                job["finished_at"] = time.time()
            self._write(job)
        return job

    def list_jobs(self, limit: int | None = None) -> list[dict]:
        jobs = sorted(
            (json.loads(p.read_text()) for p in self.dir.glob("ftjob-*.json")),
            key=lambda j: (j["created_at"], j["id"]),
            reverse=True,
        )
        return jobs if limit is None else jobs[:limit]

    def list_models(self) -> list[str]:
        base = ["base-extractor-small", "base-extractor-large"]
        tuned = [
            j["fine_tuned_model"]
            for j in self.list_jobs()
            if j.get("fine_tuned_model")
        ]
        return base + tuned


def create_fine_tuning_job(
    backend: FineTuneBackend, training_file: str, base_model: str, suffix: str
) -> str:
    """Submit; returns the job id (reference ``trainer.py:21-42``)."""
    return backend.create_job(training_file, base_model, suffix)


def monitor_job(
    backend: FineTuneBackend,
    job_id: str,
    max_polls: int = 1000,
    poll_interval_s: float = 0.0,
) -> dict:
    """Poll until a terminal state (reference ``trainer.py:44-55``).
    For a REAL backend pass a real ``poll_interval_s`` (the reference
    sleeps 60 s between polls) — the default 0 suits the simulated
    backend, which advances one state per retrieve."""
    for _ in range(max_polls):
        job = backend.retrieve_job(job_id)
        if job["status"] in TERMINAL_STATES:
            return job
        if poll_interval_s:
            time.sleep(poll_interval_s)
    raise TimeoutError(f"job {job_id} not terminal after {max_polls} polls")


def job_status(backend: FineTuneBackend, job_id: str) -> dict:
    """Status snapshot (reference ``status.py:9-37``)."""
    return backend.retrieve_job(job_id)


def run_training(
    backend: FineTuneBackend,
    examples,
    out_dir: str,
    *,
    base_model: str = "base-extractor-small",
    suffix: str = "extractor",
) -> dict:
    """End-to-end train command (reference ``train.py:92-356``):
    validate + enforce the example floor, write the JSONL training
    file, submit, monitor to terminal. ``examples`` is the Dataset from
    ``training.build_training_examples``."""
    from pdf_extractor_ray.pipelines.training import (
        prepare_training_run,
        write_training_jsonl,
    )

    import tempfile

    valid, counts = prepare_training_run(examples)
    # shards go to a FRESH subdir: Ray's write_json adds uniquely-named
    # files without cleaning, so re-running into a reused out_dir would
    # otherwise consolidate stale shards from earlier runs (duplicated
    # training examples)
    os.makedirs(out_dir, exist_ok=True)
    shard_dir = tempfile.mkdtemp(prefix="shards-", dir=out_dir)
    write_training_jsonl(valid, shard_dir)
    jsonl = sorted(str(p) for p in Path(shard_dir).glob("*.json"))
    # consolidate the sharded sink into the single upload file the
    # service API expects
    upload = os.path.join(out_dir, "training.jsonl")
    with open(upload, "w") as out:
        for part in jsonl:
            with open(part) as f:
                out.write(f.read())
    import shutil

    shutil.rmtree(shard_dir, ignore_errors=True)  # consolidated — don't leak a copy per run
    job_id = create_fine_tuning_job(backend, upload, base_model, suffix)
    job = monitor_job(backend, job_id)
    return {"job": job, "counts": counts}


def latest_fine_tuned_model(backend: FineTuneBackend, max_age_s: float | None = None) -> str | None:
    """Newest fine-tuned model id, or None — the reference's
    model-timestamp max check (``train.py:289-309``: compare the
    newest model's timestamp against today to decide whether to
    retrain), re-expressed over the job registry (finished_at replaces
    the filename-timestamp suffix). ``max_age_s`` bounds freshness:
    a model older than that returns None, signalling "retrain"."""
    import time as _time

    done = [
        j
        for j in backend.list_jobs()
        if j.get("fine_tuned_model") and j.get("finished_at") is not None
    ]
    if not done:
        return None
    newest = max(done, key=lambda j: (j["finished_at"], j["id"]))
    if max_age_s is not None and _time.time() - newest["finished_at"] > max_age_s:
        return None
    return newest["fine_tuned_model"]
