#!/bin/bash
# Smoke-run every workload against the procedural synthetic scene
# (reference scripts/test.sh with the exact lego/standup/seald flag sets;
# no datasets ship in this image so `synthetic` stands in).
set -e
python main_nerf.py synthetic -O --bound 1 --dt_gamma 0 --iters 500 --workspace /tmp/t_nerf
python main_dnerf.py synthetic -O --bound 1 --dt_gamma 0 --iters 500 --workspace /tmp/t_dnerf
python main_sdf.py synthetic --epochs 2 --workspace /tmp/t_sdf
python main_tensoRF.py synthetic -O --bound 1 --dt_gamma 0 --iters 500 --workspace /tmp/t_tensorf
