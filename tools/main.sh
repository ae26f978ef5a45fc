#!/usr/bin/env bash
# Train + evaluate both KITTI generations — the reference's main.sh
# workflow against the TPU CLI.
set -e
python main.py kitti fast -a train_all
python main.py kitti2015 fast -a train_all
python main.py kitti slow -a train_all
python main.py kitti2015 slow -a train_all
