#!/bin/bash
# Canonical static NGP runs (reference scripts/run_nerf.sh).
# lego (nerf_synthetic): 30k iters, lr 1e-2
python main_nerf.py ${1:-data/nerf_synthetic/lego} -O --bound 1.0 --scale 0.8 --dt_gamma 0 --workspace ${2:-workspace/lego}
