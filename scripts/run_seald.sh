#!/bin/bash
# Canonical SealD-NeRF edit session (reference scripts/test.sh:10).
python main_seald.py ${1:-data/dnerf/jumpingjacks} -O --bound 1.0 --scale 0.8 --dt_gamma 0 \
  --teacher_workspace ${2:-workspace/jumpingjacks} --workspace ${3:-workspace/jumpingjacks_edit} \
  --seal_config ${4:-seal.json} --time_frame ${5:-0.0}
