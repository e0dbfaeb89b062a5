"""Quick-train recipe sweep: wall-clock-to-loss on the bench scene.

VERDICT r3 item 4: eval is 19x baseline but the quick-train line moves at
~1.6x.  The step itself is already near the matmul roofline (MFU printed in
the quick-train line), so the remaining lever is reaching the SAME final loss
in less wall clock — fewer steps under a warmup+cosine schedule, and/or a
different ray batch R.  This study runs bench.setup_scene() (the exact
protocol behind the published quick-train line) across recipe variants and
reports wall, final loss, the first step at which the control recipe's final
loss is reached, and a dense-render foreground sanity check.

Run on TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/study_train_recipe.py
Env: STUDY_RECIPES="steps,lr,sched,warmup,R;..." (sched const|cosine),
     default sweep below.  STUDY_OUT appends JSON lines.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench

# (steps, lr, sched, warmup, R) — the first row is the round-2/3 constant-lr
# control (loss-crossing reference), the second the round-4 default (swept
# winner: 2.58x the control's effective rate at 58x lower final loss)
DEFAULT_RECIPES = [
    (4000, "1e-4", "const", 0, 1024),
    (800, "2e-4", "cosine", 100, 1024),
    (2000, "1e-4", "cosine", 200, 1024),
    (1200, "2e-4", "cosine", 150, 2048),
    (2000, "2e-4", "cosine", 200, 2048),
]

_KNOBS = ("BENCH_TRAIN_STEPS", "BENCH_TRAIN_LR", "BENCH_TRAIN_SCHED",
          "BENCH_TRAIN_WARMUP", "BENCH_TRAIN_R")


def main():
    from pixelnerf_tpu.config.args import enable_compilation_cache

    enable_compilation_cache()
    log = bench.log

    recipes = DEFAULT_RECIPES
    if os.environ.get("STUDY_RECIPES"):
        recipes = []
        for r in os.environ["STUDY_RECIPES"].split(";"):
            s_, lr_, sc_, w_, R_ = r.split(",")
            recipes.append((int(s_), lr_, sc_, int(w_), int(R_)))

    out_path = os.environ.get("STUDY_OUT")
    control_loss = None
    rows = []
    for steps, lr, sched, warmup, R in recipes:
        for k in _KNOBS:
            os.environ.pop(k, None)
        os.environ.update({
            "BENCH_TRAIN_STEPS": str(steps), "BENCH_TRAIN_LR": lr,
            "BENCH_TRAIN_SCHED": sched, "BENCH_TRAIN_WARMUP": str(warmup),
            "BENCH_TRAIN_R": str(R),
        })
        t0 = time.perf_counter()
        s = bench.setup_scene()
        info = bench.quick_train.last_info
        _, fg_frac = s.render_dense_reference()
        row = {
            "steps": steps, "lr": lr, "sched": sched, "warmup": warmup,
            "R": R, "train_s": round(info["train_s"], 1),
            "steady_s": round(info["steady_s"], 1),
            "loss_final": round(info["loss_final"], 4),
            "mfu": round(info["mfu"], 3), "fg_frac": round(fg_frac, 3),
            "setup_wall_s": round(time.perf_counter() - t0, 1),
        }
        # smoothed first-crossing of the control's final loss (100-step mean)
        losses = info["losses"]
        kernel = np.ones(100) / 100
        smooth = np.convolve(losses, kernel, mode="valid")
        if control_loss is None:
            control_loss = info["loss_final"]
            row["control"] = True
        cross = np.nonzero(smooth <= control_loss)[0]
        row["step_at_control_loss"] = int(cross[0]) + 100 if cross.size else -1
        rows.append(row)
        log("study:", json.dumps(row))
        if out_path:
            with open(out_path, "a") as f:
                f.write(json.dumps(row) + "\n")

    print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()


