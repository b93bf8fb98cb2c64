#!/usr/bin/env python
"""CLI shim: python train.py ... (same flag vocabulary as the reference train.py)."""
from gi_gs_tpu.cli.train_cli import main

if __name__ == "__main__":
    main()
