#!/usr/bin/env bash
# Hyperparameter-search launcher (the reference's hs.sh): one worker
# per log file, output parsed back by the hill-climb proposer.
python tools/hs.py "${1:-random}" "${2:-kitti}" "${3:-fast}" "${4:-test_te}" "${5:--}" | tee -a hs_log.0
