"""2D steady Poisson CLI (reference ``apps/2d/steady.cpp``).

Run as ``python -m pressurepoissonsolver_tpu.apps.steady2d [options]``.
"""

import sys

from ..cli import main

if __name__ == "__main__":
    sys.exit(main(2))
