#!/bin/bash
# Round-5 accuracy campaign (VERDICT r4 next-#1/#2 + ADVICE gap rows).
# Sequential on the one chip; each pass merges into its measurement JSON.
set -x
cd /root/repo

# Pass 1: 8-bit gap rows — combo1200 seeds 1-3 (was seed-1 only),
# window1200 (progression claim), percentile1200 (phantom citation),
# sgdq (optim.py docstring evidence).
timeout 4500 python -u examples/recipe_sweep.py --model mobilenetv2 \
  --recipes combo1200,window1200,percentile1200,sgdq --seeds 3 \
  2>&1 | tail -30

# Pass 2: the composite recipe (window1200 + reduce_range=False +
# distillation + BN re-est) at 5 seeds, matched 1500-step budget.
timeout 6000 python -u examples/recipe_sweep.py --model mobilenetv2 \
  --recipes distill --seeds 5 2>&1 | tail -20

# Pass 3: same composite at the 4000-step budget (their own curve says
# longer budgets converge), 5 seeds, separate table.
timeout 12000 python -u examples/recipe_sweep.py --model mobilenetv2 \
  --recipes distill --seeds 5 --steps 4000 \
  --out docs/measurements/recipe_sweep_mnv2_4000_tpu.json 2>&1 | tail -20

# Pass 4: the 4-bit weight campaign (w4a8), 3 seeds.
timeout 12000 python -u examples/recipe_sweep.py --model mobilenetv2 \
  --bits w4a8 --seeds 3 2>&1 | tail -40

# Pass 5: w4a4 — the LSQ+ learnable keep-claim regime, 3 seeds.
timeout 12000 python -u examples/recipe_sweep.py --model mobilenetv2 \
  --bits w4a4 --seeds 3 2>&1 | tail -40

# Pass 6: resnet18 w4a8 seed-33 instability (r4: -1.93% outlier) — the
# transferred recipe at the outlier seed and its neighbours.
timeout 6000 python -u examples/recipe_sweep.py --model resnet18 \
  --bits w4a8 --recipes base4,combo1200_4 --seeds 5 --seed-start 31 \
  2>&1 | tail -30

echo ALL_PASSES_DONE
