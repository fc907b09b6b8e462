"""Stage-level attribution for one registered query (r13): run it once,
prewarmed + cache-flushed (honest recompute), with the Spark UI REST API
capturing every new job and stage — wall, tasks, executor run/cpu time,
and per-stage input/shuffle bytes.  This is how the dedup_minhash_lsh
"job-count x stage-latency" attribution in OPTIMIZATION_r13.md was
produced.

Usage: python scripts/stage_attr.py QUERY [out.json]
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402
from tidb_spark.queries import all_queries  # noqa: E402
from tidb_spark.session import get_spark  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    sf_dir = "/root/testdata/sf0.1"
    spark = get_spark(
        "tidb-spark-stage-attr",
        **{"spark.ui.showConsoleProgress": "false", "spark.ui.enabled": "true"},
    )
    bench.warmup(spark, sf_dir)
    jvm = spark.sparkContext._jvm
    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:4040/api/v1/applications/{app_id}"

    def jobs():
        return {j["jobId"]: j for j in json.load(
            urllib.request.urlopen(base + "/jobs?status=succeeded"))}

    def stages():
        return {s["stageId"]: s for s in json.load(
            urllib.request.urlopen(base + "/stages?status=complete"))}

    q = all_queries()[name]
    q.spark(spark, "/root/testdata/sf0.01").write.mode("overwrite").format(
        "noop"
    ).save()
    bench._flush_all_cache(spark)
    jvm.System.gc()
    j0, s0 = jobs(), stages()
    t0 = time.perf_counter()
    q.spark(spark, sf_dir).write.mode("overwrite").format("noop").save()
    wall = round(time.perf_counter() - t0, 3)
    j1, s1 = jobs(), stages()
    doc = {"query": name, "recompute_wall": wall, "jobs": [], "stages": []}
    for jid in sorted(set(j1) - set(j0)):
        j = j1[jid]
        doc["jobs"].append({
            "job": jid,
            "submitted": j.get("submissionTime", "")[-12:],
            "completed": j.get("completionTime", "")[-12:],
            "stages": list(j["stageIds"]),
            "tasks": j["numCompletedTasks"],
        })
    for sid in sorted(set(s1) - set(s0)):
        s = s1[sid]
        doc["stages"].append({
            "stage": sid,
            "tasks": s["numCompleteTasks"],
            "run_ms": s["executorRunTime"],
            "cpu_ms": s["executorCpuTime"] // 1_000_000,
            "input_mb": round(s["inputBytes"] / 1e6, 2),
            "shuffle_write_mb": round(s["shuffleWriteBytes"] / 1e6, 2),
            "shuffle_read_mb": round(s["shuffleReadBytes"] / 1e6, 2),
            "submitted": s.get("submissionTime", "")[-12:],
            "completed": s.get("completionTime", "")[-12:],
        })
    text = json.dumps(doc, indent=1)
    print(text)
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(text)


if __name__ == "__main__":
    main()
