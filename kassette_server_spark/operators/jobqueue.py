"""Job-queue fetch & maintenance shapes (S4/S5/M1 in SURVEY §2.1) over
a (jobs, status-ledger) pair of DataFrames.

The reference stores jobs in rotated Postgres table pairs and fetches
with hand-built SQL (jobs/jobsdb.go). The engine's durable queue is a
parquet/Delta jobs table + the append-only DeliveryLedger; the fetch
patterns become one-shuffle DataFrame ops:

- unprocessed (S4, jobsdb.go:660-693, 773-826): anti-join against
  status'd job ids, ordered by job_id, limited;
- by-state / retry (S5, jobsdb.go:480-620): latest-status filter —
  max_by per job instead of the MAX(id) subselect self-join;
- compaction (M1, jobsdb.go:1083-1150): keep only live jobs (those
  whose latest state is non-terminal or absent) — the Delta OPTIMIZE /
  partition-retention analogue, here a rewrite helper.

Scale: all three are a single hash shuffle on job_id with map-side
partial aggregation; the limit is pushed via TakeOrdered.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TERMINAL_STATES = ("succeeded", "aborted")


def latest_status(status: DataFrame) -> DataFrame:
    """Latest status row per job — reference `MAX(id) GROUP BY job_id`
    (jobs/jobsdb.go:557-559) as one max_by aggregate."""
    return (
        status.groupBy("job_id")
        .agg(
            F.max_by(
                F.struct("state", "attempt", "exec_time", "retry_time"),
                F.struct("exec_time", "attempt"),
            ).alias("s")
        )
        .select("job_id", "s.*")
    )


def unprocessed(jobs: DataFrame, status: DataFrame, count: int | None = None) -> DataFrame:
    """S4 GetUnprocessed: jobs with no status row, oldest first."""
    out = jobs.join(status.select("job_id").distinct(), "job_id", "left_anti").orderBy("job_id")
    return out.limit(count) if count is not None else out


def by_state(
    jobs: DataFrame, status: DataFrame, states: tuple[str, ...], count: int | None = None
) -> DataFrame:
    """S5 GetProcessed: jobs whose LATEST state is in `states`."""
    latest = latest_status(status).filter(F.col("state").isin(*states))
    out = jobs.join(latest, "job_id").orderBy("job_id")
    return out.limit(count) if count is not None else out


def to_retry(
    jobs: DataFrame,
    status: DataFrame,
    max_retry: int = 10,
    now=None,
    count: int | None = None,
) -> DataFrame:
    """S5 GetToRetry: latest state failed, attempt < max_retry,
    retry_time elapsed (jobs/jobsdb.go:480-482, 508-620)."""
    now = now if now is not None else F.current_timestamp()
    latest = latest_status(status).filter(
        (F.col("state") == "failed")
        & (F.col("attempt") < max_retry)
        & (F.col("retry_time") <= now)
    )
    out = jobs.join(latest, "job_id").orderBy("job_id")
    return out.limit(count) if count is not None else out


def compact(jobs: DataFrame, status: DataFrame) -> DataFrame:
    """M1 clearProcessedJobs: retain only jobs still live — no status
    yet, or latest state non-terminal. The result is what a rotation
    would copy into the fresh dataset (jobs/jobsdb.go:1083-1150)."""
    latest = latest_status(status)
    terminal = latest.filter(F.col("state").isin(*TERMINAL_STATES)).select("job_id")
    return jobs.join(terminal, "job_id", "left_anti")
