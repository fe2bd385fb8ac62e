#!/bin/bash
# Round-5 campaign, budget-lever pass: the 1500-step floors are committed;
# their own budget curves say longer schedules converge — measure the best
# recipes at 4000 steps (floats cached from the composite pass).
set -x
cd /root/repo

timeout 7000 python -u examples/recipe_sweep.py --model mobilenetv2 \
  --recipes combo1200 --seeds 5 --steps 4000 \
  --out docs/measurements/recipe_sweep_mnv2_4000_tpu.json 2>&1 | tail -20

timeout 9000 python -u examples/recipe_sweep.py --model mobilenetv2 \
  --bits w4a8 --recipes combo1200_4,mp4_56 --seeds 3 --steps 4000 \
  --out docs/measurements/recipe_sweep_mnv2_w4a8_4000_tpu.json 2>&1 | tail -20

# warm-start reruns: the r4/r5 'warm' rows silently never warmed (learnable
# quantizers carry no observer; calibrate was a no-op — fixed by
# _with_observer).  Overwrite them with real warm starts.
timeout 7000 python -u examples/recipe_sweep.py --model mobilenetv2 \
  --bits w4a4 --recipes learnable44_warm --seeds 3 2>&1 | tail -10

timeout 5000 python -u examples/recipe_sweep.py --model mobilenetv2 \
  --recipes learnable_warm,combo_learnable_warm --seeds 1 2>&1 | tail -10

echo BUDGET_PASS_DONE
