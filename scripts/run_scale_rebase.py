"""Re-base the scale-probe family table under the fresh-JVM methodology
(r11 verdict #2): every probe family at one scale factor, one quiet
session, one `scale_probe.py` SUBPROCESS per query so each family gets
a cold JVM (r10's shared-session numbers flattered late queries by up
to 3.8x — see BENCH_sf3_r12.json's method note).

Usage: python scripts/run_scale_rebase.py SF_DIR OUT.json [reps]
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

#: The nine probe families the r11 verdict names: the dedup/similarity
#: and graph analytics movers plus the heaviest text and join entries.
FAMILIES = [
    "dedup_minhash_lsh",
    "dedup_lsh_verified",
    "dedup_semantic_kmeans",
    "graph_label_propagation",
    "graph_common_neighbors",
    "text_boilerplate_strip",
    "text_pii_scrub",
    "join_range",
    "embedding_neardup",
]


def main() -> int:
    sf_dir = sys.argv[1]
    out = sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    m = re.search(r"sf([0-9.]+)", sf_dir)
    merged = {
        "metric": f"sf{m.group(1)}_probe" if m else "scale_probe",
        "unit": "sec",
        "sf": float(m.group(1).rstrip(".")) if m else None,
        "method": (
            "per-query fresh JVM (one scripts/scale_probe.py subprocess "
            f"per family), exact-plan sf0.001 prewarm, {reps} reps with "
            "cache-clear + GC between, noop-write sink; bench.py's three "
            "fixed control probes at each query's session start/end "
            "(calibration ctrl_cpu_shuffle 0.40, ctrl_scan_agg 0.19, "
            "ctrl_window 0.57 - quiet-host min-of-2). All walls RAW; "
            "divide by the nearest control factor to compare across "
            "sessions. Pre-r11 probe artifacts (BENCH_sf*_r10 and "
            "earlier) are warm-session and NOT comparable to this "
            "series."
        ),
        "queries": {},
        "controls": {},
    }
    for q in FAMILIES:
        tmp = f"/tmp/_probe_{q}.json"
        r = subprocess.run(
            [sys.executable, "scripts/scale_probe.py", sf_dir, q, str(reps), tmp],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        if r.returncode != 0:
            merged["queries"][q] = {"error": f"exit {r.returncode}"}
            continue
        d = json.load(open(tmp))
        merged["queries"][q] = d["queries"][q]
        merged["controls"][q] = d["controls"]
        print(f"== {q}: {merged['queries'][q]}", flush=True)
    with open(out, "w") as f:
        json.dump(merged, f, indent=1)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
