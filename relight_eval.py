#!/usr/bin/env python
"""CLI shim: python relight_eval.py ... (same flag vocabulary as the reference relight_eval.py)."""
from gi_gs_tpu.cli.relight_eval_cli import main

if __name__ == "__main__":
    main()
