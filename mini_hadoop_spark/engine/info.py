"""Progress / cluster info — the reference's polling API
(file_op_info / job_info / cluster_info, lib/mini_hadoop.ex:75-109)
backed by Spark's StatusTracker instead of hand-rolled ETS counters
(job_runner.ex:660-668, job_execution.ex:80-111).

The reference reports per-phase {completed, total} percentages; Spark's
tracker exposes the same shape per job/stage, plus executor liveness —
its scheduler IS the reference's C1-C7 block (SURVEY.md §2.1), so this
module is a read-only window, not a scheduler."""

from __future__ import annotations

import time

from pyspark.sql import SparkSession

_START_TIME = time.monotonic()


def job_info(spark: SparkSession, job_id: int) -> dict:
    """Progress for one Spark job: per-stage task counts and an overall
    percentage (job_execution.ex:80-111's progress math)."""
    tracker = spark.sparkContext.statusTracker()
    info = tracker.getJobInfo(job_id)
    if info is None:
        return {"job_id": job_id, "status": "unknown", "stages": []}
    stages = []
    total = done = 0
    for sid in info.stageIds:
        s = tracker.getStageInfo(sid)
        if s is None:
            continue
        stages.append(
            {
                "stage_id": sid,
                "name": s.name,
                "completed": s.numCompletedTasks,
                "failed": s.numFailedTasks,
                "total": s.numTasks,
            }
        )
        total += s.numTasks
        done += s.numCompletedTasks
    return {
        "job_id": job_id,
        "status": info.status,
        "stages": stages,
        "progress_pct": round(100.0 * done / total, 1) if total else 0.0,
    }


def active_jobs(spark: SparkSession) -> list[int]:
    return list(spark.sparkContext.statusTracker().getActiveJobsIds())


def cluster_info(spark: SparkSession) -> dict:
    """cluster_info analogue (mini_hadoop.ex:83-109): master state,
    worker/parallelism counts, uptime."""
    sc = spark.sparkContext
    return {
        "app_name": sc.appName,
        "app_id": sc.applicationId,
        "master": sc.master,
        "default_parallelism": sc.defaultParallelism,
        "uptime_sec": round(time.monotonic() - _START_TIME, 1),
        "spark_version": sc.version,
    }
