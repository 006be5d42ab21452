#!/usr/bin/env python
"""Profile the flagship pipeline with Spark event logs: attribute wall time
to stages vs driver dead-time (gaps where no stage is running).

Usage: SPARK_GRAFT_CPUS=8 python scripts/profile_eventlog.py [n_base]

Prints per-job and per-stage wall, executor-run, and the total dead time —
the driver-synchronized serial fraction that caps scaling efficiency.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 60000
    evdir = tempfile.mkdtemp(prefix="sparkev_")

    from ditto_spark.session import get_spark
    from ditto_spark.synth import generate_transcripts
    from ditto_spark.pipeline import dedup_transcripts, PipelineConfig

    spark = get_spark(
        "profile",
        cores=cores,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    transcripts = generate_transcripts(
        spark, n_base=n_base, seed=42, hot_template_frac=0.02
    ).cache()
    transcripts.count()
    # warm-up pass (heap commit + JIT), untimed
    dedup_transcripts(transcripts, PipelineConfig()).clusters.count()
    spark.catalog.clearCache()
    transcripts.cache()
    transcripts.count()

    t0 = time.monotonic()
    marker_start = time.time() * 1000
    res = dedup_transcripts(transcripts, PipelineConfig())
    res.clusters.cache().count()
    wall = time.monotonic() - t0
    marker_end = time.time() * 1000
    spark.stop()
    time.sleep(1)

    # parse the event log: stages inside [marker_start, marker_end]
    ev = [os.path.join(evdir, f) for f in os.listdir(evdir) if not f.startswith(".")]
    if os.path.isdir(ev[0]):  # Spark 4 rolling event-log dir (eventlog_v2_*)
        ev = sorted(
            os.path.join(ev[0], f)
            for f in os.listdir(ev[0])
            if f.startswith("events_")
        )
    stages = []  # (submit_ms, complete_ms, name, stage_id, task_run_ms)
    task_run: dict[int, float] = {}
    gc_ms: dict[int, float] = {}
    cpu_ns: dict[int, float] = {}
    shuf_w: dict[int, float] = {}
    import itertools

    lines = itertools.chain.from_iterable(open(p) for p in ev)
    if True:
        for line in lines:
            try:
                e = json.loads(line)
            except json.JSONDecodeError:
                continue
            if e.get("Event") == "SparkListenerTaskEnd":
                sid = e["Stage ID"]
                m = e.get("Task Metrics") or {}
                task_run[sid] = task_run.get(sid, 0.0) + m.get("Executor Run Time", 0)
                gc_ms[sid] = gc_ms.get(sid, 0.0) + m.get("JVM GC Time", 0)
                cpu_ns[sid] = cpu_ns.get(sid, 0.0) + m.get("Executor CPU Time", 0)
                sm = m.get("Shuffle Write Metrics") or {}
                shuf_w[sid] = shuf_w.get(sid, 0.0) + sm.get("Shuffle Bytes Written", 0)
            elif e.get("Event") == "SparkListenerStageCompleted":
                si = e["Stage Info"]
                sub = si.get("Submission Time")
                comp = si.get("Completion Time")
                if sub and comp and comp >= marker_start and sub <= marker_end:
                    stages.append((sub, comp, si["Stage Name"].split("\n")[0][:60],
                                   si["Stage ID"], si.get("Number of Tasks", 0)))
    stages.sort()
    if not stages:
        print("no stages captured"); return

    # merge stage intervals -> busy time; gaps = dead time
    busy = 0.0
    gaps = []
    cur_s, cur_e = stages[0][0], stages[0][1]
    prev_name = stages[0][2]
    for s, e, name, sid, ntasks in stages[1:]:
        if s <= cur_e:
            cur_e = max(cur_e, e)
        else:
            busy += cur_e - cur_s
            gaps.append((cur_e, s, (s - cur_e) / 1000.0, prev_name, name))
            cur_s, cur_e = s, e
        prev_name = name
    busy += cur_e - cur_s
    span = stages[-1][1] - stages[0][0]
    dead_in_gaps = sum(g[2] for g in gaps)
    pre = (stages[0][0] - marker_start) / 1000.0
    post = (marker_end - stages[-1][1]) / 1000.0

    print(f"cores={cores} n_base={n_base} wall={wall:.1f}s "
          f"stages={len(stages)}")
    print(f"stage-busy={busy/1000:.1f}s dead-in-gaps={dead_in_gaps:.1f}s "
          f"pre-first-stage={pre:.1f}s post-last-stage={post:.1f}s")
    ids = [s[3] for s in stages]
    tot_run = sum(task_run.get(i, 0) for i in ids)
    print(f"sum(executor run time)/cores = {tot_run/1000/cores:.1f}s "
          f"(perfect-parallel lower bound); total {tot_run/1000:.1f} core-s")
    print(f"sum(JVM GC time) = {sum(gc_ms.get(i,0) for i in ids)/1000:.1f} core-s; "
          f"sum(executor CPU) = {sum(cpu_ns.get(i,0) for i in ids)/1e9:.1f} core-s; "
          f"run-minus-CPU (blocked/IO/Python-wait) = "
          f"{(tot_run - sum(cpu_ns.get(i,0) for i in ids)/1e6)/1000:.1f} core-s; "
          f"shuffle bytes written = "
          f"{sum(shuf_w.get(i,0) for i in ids)/1e9:.2f} GB")
    print("\nlargest gaps (end-of-prev -> start-of-next):")
    for _, _, d, p, n in sorted(gaps, key=lambda g: -g[2])[:15]:
        print(f"  {d:6.2f}s  after [{p}]  before [{n}]")
    print("\nslowest stages (wall s | ntasks | run core-s | cpu core-s | "
          "gc core-s | shufW MB):")
    for s, e, name, sid, ntasks in sorted(stages, key=lambda x: x[0]-x[1])[:15]:
        print(f"  {(e-s)/1000:6.2f}s {ntasks:4d}t "
              f"{task_run.get(sid,0)/1000:7.1f} "
              f"{cpu_ns.get(sid,0)/1e9:7.1f} "
              f"{gc_ms.get(sid,0)/1000:6.1f} "
              f"{shuf_w.get(sid,0)/1e6:8.1f}  {name[:48]} (id {sid})")
    print(f"\neventlog: {ev[0]}")


if __name__ == "__main__":
    main()
