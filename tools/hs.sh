#!/usr/bin/env bash
# Hyperparameter-search launcher (the reference's hs.sh): one worker
# per log file, output parsed back by the hill-climb proposer.
# hs.py appends each result line to its log file itself, so stdout is
# left alone here (tee'ing it again would double every line the
# proposer re-parses).
python tools/hs.py "${1:-random}" "${2:-kitti}" "${3:-fast}" "${4:-test_te}" "${5:--}"
