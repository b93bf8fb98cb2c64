#!/usr/bin/env python
"""CLI shim: python normal_eval.py ... (same flag vocabulary as the reference normal_eval.py)."""
from gi_gs_tpu.cli.normal_eval_cli import main

if __name__ == "__main__":
    main()
