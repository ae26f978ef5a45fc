#!/usr/bin/env bash
# Preprocess all datasets — the reference's preprocess.sh against the
# python pipeline. Expects raw data under data.kitti*/unzip and
# data.mb/unzip (tools/download_middlebury.sh).
set -e
python -m mccnn_tpu.data.preprocess_kitti
python -m mccnn_tpu.data.preprocess_mb imperfect gray
python -m mccnn_tpu.data.preprocess_mb perfect gray
