"""Does the reference's EXACT golden stance (step_y=0.05) learn
stairstair under default weights now that stiction ringing is fixed?

Round-2 shipped step_y=0.09 (+4 cm) as a documented deviation because
the narrow stance pitched over at the first riser. With the tangential
impulse cap the narrow stance survives LONGER open-loop than the wide
one (317 vs 243 steps), so the deviation may be removable."""

import json

from paddlerobotics_tpu.cli import train_quadruped

OUT = "/tmp/stance_check"

train_quadruped.main([
    "--task_mode", "stairstair", "--max_steps", "40000000",
    "--step_y", "0.05", "--outdir", OUT, "--suffix", "v"])

velx, succ = [], []
for line in open(f"{OUT}/v/metrics.jsonl"):
    d = json.loads(line)
    if d["tag"] == "train/mean_velx":
        velx.append(d["value"])
    elif d["tag"] == "train/mean_success":
        succ.append(d["value"])
tail = lambda xs: round(sum(xs[-8:]) / max(len(xs[-8:]), 1), 3)
print(json.dumps({"step_y": 0.05, "final_velx": tail(velx),
                  "final_success": tail(succ),
                  "peak_velx": round(max(velx), 3)}))
