#!/usr/bin/env python3
"""Driver entry point: delegates to specenh.bench.headline (one JSON line)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from specenh.bench.headline import main

if __name__ == "__main__":
    main()
