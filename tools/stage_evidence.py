#!/usr/bin/env python
"""Per-stage task-count/runtime evidence for named queries (r13 VERDICT #5:
"attach per-query task counts for everything <= 1.0" in the 8->32 scaling
block). Runs each query (one untimed warmup, then one timed run), with the
Spark event log enabled, and reports for the timed run's jobs: per stage
the task count, summed executor run time, and submit->complete wall time.

A query whose timed run is dominated by 1-task stages is FLOOR-BOUND at
sf0.1 (single-row-group inputs scan as one task) — more cores cannot help;
a query with wide stages but ratio <= 1.0 points at contention/overhead.

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
      python tools/stage_evidence.py q62_dominant_suppliers k_count
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    log_dir = tempfile.mkdtemp(prefix="stage_evidence_")

    from udlang_spark.queries import QUERIES
    from udlang_spark.session import get_spark, release_caches

    spark = get_spark(
        "udlang_spark_stage_evidence",
        **{
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": log_dir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    marks: dict[str, tuple[float, float, float]] = {}
    for name in names:
        if name not in QUERIES:
            print(f"SKIP {name}", file=sys.stderr)
            continue
        sc.setJobDescription(f"evidence:{name}:warmup")
        QUERIES[name](spark, sf).write.format("noop").mode("overwrite").save()
        release_caches()
        t0 = time.time()
        p0 = time.perf_counter()
        sc.setJobDescription(f"evidence:{name}")
        QUERIES[name](spark, sf).write.format("noop").mode("overwrite").save()
        marks[name] = (t0, time.time(), time.perf_counter() - p0)
        release_caches()
    app_id = sc.applicationId
    spark.stop()

    # parse the event log (Spark 4 rolling layout: eventlog_v2_<app>/events_*;
    # single-file layout as fallback): map jobs to queries via the job
    # description property
    import glob

    candidates = sorted(
        glob.glob(os.path.join(log_dir, f"eventlog_v2_{app_id}", "events_*"))
    ) or [os.path.join(log_dir, app_id)]
    lines: list[str] = []
    for p in candidates:
        with open(p) as fh:
            lines.extend(fh)
    stages: dict[int, dict] = {}
    jobs: dict[int, dict] = {}
    if True:
        for line in lines:
            ev = json.loads(line)
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                desc = (ev.get("Properties") or {}).get(
                    "spark.job.description", ""
                )
                jobs[ev["Job ID"]] = {
                    "desc": desc,
                    "stage_ids": [
                        s["Stage ID"] for s in ev.get("Stage Infos", [])
                    ],
                }
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                stages[si["Stage ID"]] = {
                    "tasks": si["Number of Tasks"],
                    "name": si["Stage Name"].split("\n")[0][:60],
                    "wall_ms": (si.get("Completion Time") or 0)
                    - (si.get("Submission Time") or 0),
                }

    for name, (_, _, wall) in marks.items():
        label = f"evidence:{name}"
        q_stages = []
        for j in jobs.values():
            if j["desc"] == label:
                for sid in j["stage_ids"]:
                    if sid in stages:
                        q_stages.append((sid, stages[sid]))
        q_stages.sort(key=lambda kv: -kv[1]["wall_ms"])
        n1 = sum(1 for _, s in q_stages if s["tasks"] == 1)
        t1 = sum(s["wall_ms"] for _, s in q_stages if s["tasks"] == 1)
        tall = sum(s["wall_ms"] for _, s in q_stages)
        print(
            f"\n{name}: timed {wall:.3f}s; {len(q_stages)} stages, "
            f"{n1} single-task ({t1}/{tall} ms of stage wall time)"
        )
        for sid, s in q_stages[:8]:
            print(
                f"  stage {sid}: tasks={s['tasks']:>3} wall={s['wall_ms']:>6}ms"
                f"  {s['name']}"
            )


if __name__ == "__main__":
    main()
