#!/bin/bash
# Round-5 campaign, continuation: passes 4-6 (passes 1-3 already committed
# to the measurement JSONs; sgdq collapse under separate investigation).
set -x
cd /root/repo

timeout 14000 python -u examples/recipe_sweep.py --model mobilenetv2 \
  --bits w4a8 --seeds 3 2>&1 | tail -40

timeout 14000 python -u examples/recipe_sweep.py --model mobilenetv2 \
  --bits w4a4 --seeds 3 2>&1 | tail -40

timeout 7000 python -u examples/recipe_sweep.py --model resnet18 \
  --bits w4a8 --recipes base4,combo1200_4 --seeds 5 --seed-start 31 \
  2>&1 | tail -30

echo ALL_PASSES_DONE
