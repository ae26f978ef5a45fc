#!/usr/bin/env bash
# Fetch the Middlebury stereo datasets into data.mb/unzip/ — the
# reference's download_middlebury.sh layout, consumed by
# mccnn_tpu/data/preprocess_mb.py.
set -e

mkdir -p data.mb/unzip
cd data.mb/unzip

wget -r -np -nc -A png,pfm,pgm,ppm,txt \
    http://vision.middlebury.edu/stereo/data/scenes2014/datasets/
wget -r -np -nc -A png,pgm \
    http://vision.middlebury.edu/stereo/data/scenes2006/HalfSize/
wget -r -np -nc -A png,pgm \
    http://vision.middlebury.edu/stereo/data/scenes2005/HalfSize/
wget -r -np -nc -A ppm,pgm \
    http://vision.middlebury.edu/stereo/data/scenes2003/
wget -r -np -nc -A ppm,pgm,png \
    http://vision.middlebury.edu/stereo/data/scenes2001/data/

# MiddEval3 half-resolution inputs (submission)
wget -nc http://vision.middlebury.edu/stereo/submit3/zip/MiddEval3-data-H.zip
unzip -n MiddEval3-data-H.zip
