#!/usr/bin/env python
"""Training CLI (reference surface: `python train.py --config=<yaml> --run-id=<id> [--cpu]`)."""
from etmppo_tpu.cli import train_main

if __name__ == "__main__":
    train_main()
