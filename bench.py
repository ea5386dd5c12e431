#!/usr/bin/env python
"""Headline benchmark driver: prints ONE JSON line (see the module).

Thin shim over :mod:`sks_tpu.bench.headline` so the same code serves the
repo-root driver convention and the installed ``sks-bench`` console entry
point (pyproject.toml).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sks_tpu.bench.headline import main  # noqa: E402

if __name__ == "__main__":
    sys.exit(main())
