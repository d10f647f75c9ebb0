#!/usr/bin/env python3
"""Launcher shim: mirrors reference ``run.py``; the implementation lives in
``heal_swin_tpu.cli`` (also installed as the ``heal-swin-tpu`` console script)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from heal_swin_tpu.cli import main

if __name__ == "__main__":
    main()
