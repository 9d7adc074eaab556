#!/usr/bin/env python3
"""Aggregate a Spark event log: per-job wall time with callsite, sorted.

Usage: python3 tools/evlog.py /tmp/evlog/<app-id> [top_n]
Shows where single-query harness time goes (job-level granularity), plus
gaps between jobs (driver-side work: planning, listing, footer reads).
"""
import json, sys

path = sys.argv[1]
top = int(sys.argv[2]) if len(sys.argv) > 2 else 40
jobs = {}
events = []
for line in open(path):
    try:
        e = json.loads(line)
    except json.JSONDecodeError:
        continue
    t = e.get("Event")
    if t == "SparkListenerJobStart":
        jid = e["Job ID"]
        jobs[jid] = {
            "start": e["Submission Time"],
            "desc": e.get("Properties", {}).get("spark.job.description", "")
            or e.get("Properties", {}).get("callSite.short", ""),
            "site": (e.get("Stage Infos") or [{}])[0].get("Details", "")[:160],
            "nstages": len(e.get("Stage IDs", [])),
        }
    elif t == "SparkListenerJobEnd":
        jid = e["Job ID"]
        if jid in jobs:
            jobs[jid]["end"] = e["Completion Time"]

done = [(j, v) for j, v in jobs.items() if "end" in v]
done.sort(key=lambda kv: kv[0])
total = 0.0
rows = []
prev_end = None
gap_total = 0.0
for j, v in done:
    dur = (v["end"] - v["start"]) / 1000.0
    gap = (v["start"] - prev_end) / 1000.0 if prev_end is not None else 0.0
    if prev_end is not None and gap > 0:
        gap_total += gap
    prev_end = max(prev_end or v["end"], v["end"])
    total += dur
    rows.append((dur, gap, j, v))

print(f"jobs={len(done)} sum_job_s={total:.2f} sum_gap_s={gap_total:.2f}")
print(f"{'dur_s':>7} {'gap_s':>7} {'job':>4} {'nstg':>4}  callsite")
for dur, gap, j, v in sorted(rows, key=lambda r: -r[0])[:top]:
    site = v["site"].replace("\n", " | ")[:140]
    print(f"{dur:7.2f} {gap:7.2f} {j:4d} {v['nstages']:4d}  {site}")
print("\n-- largest inter-job gaps (driver-side work) --")
for dur, gap, j, v in sorted(rows, key=lambda r: -r[1])[:15]:
    site = v["site"].replace("\n", " | ")[:140]
    print(f"gap={gap:7.2f} before job {j:4d}  {site}")
