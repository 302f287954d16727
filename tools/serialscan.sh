#!/bin/bash
# For each query: run graft.Time with an event log, then report stages with
# task_time >= 0.4s and parallelism <= 4 (the AQE byte-coalescing
# serialization signature). Usage: tools/serialscan.sh q1 q2 ...
CP="target/scala-2.13/classes:/opt/spark/jars/*"
AO=$(for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do echo -n "--add-opens java.base/$p=ALL-UNNAMED "; done)
for q in "$@"; do
  rm -rf /tmp/serialscan_logs; mkdir -p /tmp/serialscan_logs
  SPARK_GRAFT_CPUS=32 java $AO -Xmx8g -Dspark.sql.session.timeZone=UTC \
    -Dspark.eventLog.enabled=true -Dspark.eventLog.compress=false \
    -Dspark.eventLog.dir=/tmp/serialscan_logs -cp "$CP" \
    graft.Time "$q" /root/testdata/sf0.1 2 2>/dev/null | tail -1
  python3 - "$q" <<'EOF'
import json,glob,collections,sys
q=sys.argv[1]
files=glob.glob('/tmp/serialscan_logs/eventlog_v2_local-*/events_1_local-*')
if not files: sys.exit(0)
stages={}; ttime=collections.defaultdict(float); tcnt=collections.defaultdict(int)
for line in open(files[0]):
    try: e=json.loads(line)
    except: continue
    ev=e.get("Event")
    if ev=="SparkListenerStageCompleted":
        si=e["Stage Info"]; stages[si["Stage ID"]]=(si.get("Submission Time",0),si.get("Completion Time",0))
    elif ev=="SparkListenerTaskEnd":
        ti=e.get("Task Info",{}); sid=e["Stage ID"]
        ttime[sid]+=(ti.get("Finish Time",0)-ti.get("Launch Time",0))/1e3; tcnt[sid]+=1
if not stages: sys.exit(0)
tmax=max(c for _,c in stages.values()); tmin=min(s for s,_ in stages.values())
cut=tmax-(tmax-tmin)/4   # final rep window
hits=[(s,ttime[s],tcnt[s]) for s,(st,c) in stages.items()
      if st>=cut and ttime[s]>=0.4 and tcnt[s]<=4]
for s,t,n in sorted(hits,key=lambda x:-x[1])[:4]:
    print(f"  [{q}] SERIAL stage {s}: task_s={t:.2f} n={n}")
EOF
done
