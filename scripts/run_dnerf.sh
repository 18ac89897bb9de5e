#!/bin/bash
# Canonical D-NeRF runs (reference scripts/run_dnerf.sh).
python main_dnerf.py ${1:-data/dnerf/jumpingjacks} -O --bound 1.0 --scale 0.8 --dt_gamma 0 --workspace ${2:-workspace/jumpingjacks}
