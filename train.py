#!/usr/bin/env python3
"""Entry point: python train.py --config <variant> (see dcgan_sr_tpu/cli.py)."""

import os
import sys

if "--cpu" in sys.argv:
    # must precede the cli import (which imports jax): XLA's C++ logger
    # latches TF_CPP_MIN_LOG_LEVEL when the backend .so loads, so pin_cpu()
    # cannot mute the cpu_aot_loader pseudo-feature load noise itself
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

from dcgan_sr_tpu.cli import main

if __name__ == "__main__":
    main()
