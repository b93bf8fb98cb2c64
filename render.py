#!/usr/bin/env python
"""CLI shim: python render.py ... (same flag vocabulary as the reference render.py)."""
from gi_gs_tpu.cli.render_cli import main

if __name__ == "__main__":
    main()
