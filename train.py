#!/usr/bin/env python3
"""Entry point: python train.py --config <variant> (see dcgan_sr_tpu/cli.py)."""

from dcgan_sr_tpu.cli import main

if __name__ == "__main__":
    main()
