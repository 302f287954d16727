#!/usr/bin/env python3
"""Parse a Spark event log (JSON lines) into a per-stage time profile.

Usage: python3 tools/stageprof.py <eventlog file> [topN]

Prints stages sorted by total task time with name, #tasks, task-time sum,
wall (completion - submission), shuffle read/write bytes, and the job group
description active when the stage ran.
"""
import json, sys
from collections import defaultdict

path = sys.argv[1]
top = int(sys.argv[2]) if len(sys.argv) > 2 else 30

stages = {}
task_time = defaultdict(float)
task_cnt = defaultdict(int)
sread = defaultdict(int)
swrite = defaultdict(int)
inbytes = defaultdict(int)
job_of_stage = {}
job_desc = {}
job_wall = {}

for line in open(path):
    try:
        e = json.loads(line)
    except json.JSONDecodeError:
        continue
    ev = e.get("Event")
    if ev == "SparkListenerStageCompleted":
        si = e["Stage Info"]
        sid = si["Stage ID"]
        stages[sid] = (si.get("Stage Name", ""),
                       si.get("Submission Time", 0),
                       si.get("Completion Time", 0),
                       si.get("Number of Tasks", 0))
    elif ev == "SparkListenerTaskEnd":
        sid = e["Stage ID"]
        ti = e.get("Task Info", {})
        task_time[sid] += (ti.get("Finish Time", 0) - ti.get("Launch Time", 0)) / 1e3
        task_cnt[sid] += 1
        m = e.get("Task Metrics") or {}
        srm = m.get("Shuffle Read Metrics") or {}
        swm = m.get("Shuffle Write Metrics") or {}
        im = m.get("Input Metrics") or {}
        sread[sid] += srm.get("Remote Bytes Read", 0) + srm.get("Local Bytes Read", 0)
        swrite[sid] += swm.get("Shuffle Bytes Written", 0)
        inbytes[sid] += im.get("Bytes Read", 0)
    elif ev == "SparkListenerJobStart":
        jid = e["Job ID"]
        job_desc[jid] = (e.get("Properties") or {}).get("spark.job.description", "")
        for sid in e.get("Stage IDs", []):
            job_of_stage[sid] = jid
        job_wall[jid] = [e.get("Submission Time", 0), 0]
    elif ev == "SparkListenerJobEnd":
        jid = e["Job ID"]
        if jid in job_wall:
            job_wall[jid][1] = e.get("Completion Time", 0)

total_task = sum(task_time.values())
total_wall = sum(max(0, (c - s)) for (_, s, c, _) in stages.values()) / 1e3
print(f"stages={len(stages)} total_task_time={total_task:.2f}s sum_stage_wall={total_wall:.2f}s")
print(f"{'sid':>5} {'wall_s':>7} {'task_s':>7} {'n':>4} {'in_MB':>7} {'sh_r_MB':>8} {'sh_w_MB':>8}  name")
for sid, (name, sub, comp, n) in sorted(stages.items(), key=lambda kv: -task_time[kv[0]])[:top]:
    wall = (comp - sub) / 1e3
    jid = job_of_stage.get(sid)
    desc = job_desc.get(jid, "")
    nm = name.split("\n")[0][:80]
    print(f"{sid:>5} {wall:7.2f} {task_time[sid]:7.2f} {task_cnt[sid]:>4} "
          f"{inbytes[sid]/2**20:7.1f} {sread[sid]/2**20:8.1f} {swrite[sid]/2**20:8.1f}  {nm}"
          + (f"  [{desc[:40]}]" if desc else ""))

# job-level rollup
print("\njobs by wall:")
for jid, (s, c) in sorted(job_wall.items(), key=lambda kv: -(kv[1][1] - kv[1][0]))[:20]:
    print(f"  job {jid:>4} {(c-s)/1e3:7.2f}s  {job_desc.get(jid,'')[:70]}")
