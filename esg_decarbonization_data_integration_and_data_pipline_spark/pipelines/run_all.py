"""Batch DAG driver (SURVEY.md §2.12 C1/C2).

The reference's nightly ``main()`` runs ~30 read->transform->write
steps sequentially in one process with a per-table dispatch factory
(reference: main.py:29-113; factories/source_to_raw_factory.py:9-26).
Here the DAG is an explicit job registry plus a topological runner;
independent stages run concurrently on one SparkSession (Spark jobs
are thread-safe), which the reference cannot do.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Callable
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Job:
    name: str
    run: Callable[[SparkSession, dt.date], DataFrame | None]
    depends_on: list[str] = field(default_factory=list)


class JobRegistry:
    """Name -> job dispatch (the reference's factory, C2)."""

    def __init__(self) -> None:
        self._jobs: dict[str, Job] = {}

    def register(self, name: str, depends_on: list[str] | None = None):
        def deco(fn):
            self._jobs[name] = Job(name, fn, list(depends_on or []))
            return fn
        return deco

    def __getitem__(self, name: str) -> Job:
        return self._jobs[name]

    def names(self) -> list[str]:
        return list(self._jobs)

    def run_all(self, spark: SparkSession, run_date: dt.date,
                max_workers: int = 4) -> dict[str, str]:
        """Run every job respecting dependencies; independent jobs run
        concurrently. Returns name -> 'ok' | error string (the
        reference's per-job try/except result collection,
        jobs/raw_to_staging.py:208-213)."""
        results: dict[str, str] = {}
        done: set[str] = set()
        failed: set[str] = set()
        pending = dict(self._jobs)
        with ThreadPoolExecutor(max_workers=max_workers) as pool:
            while pending:
                # a job whose dependency failed is skipped, NOT run over
                # stale upstream data; iterate to a fixpoint so skips
                # cascade regardless of registration order
                changed = True
                while changed:
                    changed = False
                    for j in list(pending.values()):
                        bad = [d for d in j.depends_on if d in failed]
                        if bad:
                            results[j.name] = (
                                f"skipped: dependency {bad[0]} failed")
                            done.add(j.name)
                            failed.add(j.name)
                            del pending[j.name]
                            changed = True
                ready = [j for j in pending.values()
                         if all(d in done for d in j.depends_on)]
                if not ready:
                    if pending:
                        for j in pending.values():
                            results[j.name] = "error: unsatisfiable dependencies"
                    break
                futures = {
                    j.name: pool.submit(self._run_one, j, spark, run_date)
                    for j in ready
                }
                for name, fut in futures.items():
                    results[name] = fut.result()
                    done.add(name)
                    if results[name] != "ok":
                        failed.add(name)
                    del pending[name]
        return results

    def run_range(self, spark: SparkSession, run_dates,
                  max_workers: int = 4,
                  stop_on_failure: bool = True) -> dict:
        """Backfill: :meth:`run_all` once per run_date, oldest first
        -- the reference's month-loop ETL replay (jobs/csr_etl.py's
        per-month DELETE+append loop) expressed over the idempotent
        writers, so re-running a backfill (or overlapping it with the
        nightly) converges instead of duplicating.  Dates run
        SEQUENTIALLY (a later month may read what an earlier month
        wrote); jobs within each date still fan out.

        ``stop_on_failure``: a date with any non-ok job stops the
        backfill (later dates would read bad upstream state); pass
        False to attempt every date regardless (per-date results are
        returned either way, keyed by ISO date)."""
        results: dict[str, dict[str, str]] = {}
        for d in sorted(run_dates):
            r = self.run_all(spark, d, max_workers=max_workers)
            results[d.isoformat()] = r
            if stop_on_failure and any(v != "ok" for v in r.values()):
                break
        return results

    @staticmethod
    def _run_one(job: Job, spark: SparkSession, run_date: dt.date) -> str:
        try:
            out = job.run(spark, run_date)
            if out is not None:
                out.count()  # force materialization like a write would
            return "ok"
        except Exception as e:  # noqa: BLE001 - mirror reference error capture
            return f"error: {e}"
