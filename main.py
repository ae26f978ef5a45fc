#!/usr/bin/env python
"""CLI entry point: python main.py <dataset> <arch> -a <action> [flags].

Same surface as the reference's ./main.lua (main.lua:10-32)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mccnn_tpu.cli import main

if __name__ == "__main__":
    main()
