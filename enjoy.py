#!/usr/bin/env python
"""Inference CLI (reference surface: `python enjoy.py --model=<path>`)."""
from etmppo_tpu.cli import enjoy_main

if __name__ == "__main__":
    enjoy_main()
