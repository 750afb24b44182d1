"""Batch job orchestration (SURVEY §3.1, §7.2.6): the engine-side
equivalent of the reference's cron sweep (cubicerpetl/etl_cron.py:35-56).

The reference polls `etl.job` records in state 'ready', transitions each
through ready → running → done via RPC (`action_start`/`action_done`,
etl_cron.py:45,55), and processes rows in 100-row chunks — with the
chunking tail-drop bug (etl_cron.py:49-50) and no per-job error
isolation (one raising job kills the sweep). Here:

* jobs are JobSpec values + a driver-side state table (no server);
* chunking disappears — one DataFrame plan per job, partitions replace
  chunks (no tail to drop);
* each job is isolated: a failure records state='error' with the
  traceback in the run ledger (I7) and the sweep continues — the
  per-row-try/except discipline of the reference's load loop
  (cubicerpetl/cubicerpetl.py:738-745) lifted to job granularity.

State transitions happen on the driver only; executors never see them.
"""

from __future__ import annotations

import traceback
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from cubicerp_client_etl_spark.plans.interpreter import run_job
from cubicerp_client_etl_spark.plans.spec import JobSpec
from cubicerp_client_etl_spark.sinks.ledger import write_ledger


@dataclass
class JobRun:
    """One schedulable job: spec + mutable lifecycle state."""

    spec: JobSpec
    state: str = "ready"  # ready → running → done | error
    error: str | None = None
    result: DataFrame | None = field(default=None, repr=False)


def run_ready_jobs(
    spark: SparkSession, runs: list[JobRun], job_filter: str | None = None
) -> list[JobRun]:
    """Sweep: run every job in state 'ready' (optionally only the one
    named ``job_filter``), mirroring etl_cron.run's loop with the state
    re-check guard (etl_cron.py:43) and without its failure cascade."""
    for run in runs:
        if run.state != "ready":  # guard re-check, as etl_cron.py:43
            continue
        if job_filter is not None and run.spec.name != job_filter:
            continue
        run.state = "running"
        try:
            run.result = run_job(spark, run.spec)
            run.state = "done"
        except Exception:
            run.state = "error"
            run.error = traceback.format_exc()
            if run.spec.ledger_path:
                err_df = spark.createDataFrame(
                    [(run.spec.name, "error", run.error)],
                    "job string, level string, message string",
                )
                write_ledger(err_df, run.spec.ledger_path)
    return runs
