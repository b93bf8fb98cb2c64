#!/usr/bin/env python
"""CLI shim: python relight.py ... (same flag vocabulary as the reference relight.py)."""
from gi_gs_tpu.cli.relight_cli import main

if __name__ == "__main__":
    main()
