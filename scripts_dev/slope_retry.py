"""up_slope/slopeslope retry with the sample-efficiency schedule
(B=1024, K=16 — docs/update_schedule.md); reuses task_matrix.run."""
import json
import os
import traceback

from scripts_dev.task_matrix import run

os.makedirs("/tmp/task_matrix", exist_ok=True)
results = []
for mode in ("up_slope", "slopeslope"):
    print(f"=== {mode} ===", flush=True)
    try:
        r = run(mode, B=1024, updates_per_step=16, suffix="_b1024_u16")
    except Exception:
        traceback.print_exc()
        r = {"task": mode, "error": traceback.format_exc()[-300:]}
    print(json.dumps(r), flush=True)
    results.append(r)
    with open("/tmp/task_matrix/retry_summary.json", "w") as f:
        json.dump(results, f, indent=1)
