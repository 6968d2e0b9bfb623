"""``python -m qoaudio_tpu`` — alias for the CLI (cli.py).

The reference ships runnable examples (/root/reference/examples/); the
CLI is their umbrella here, and the package itself should launch it.
"""

import sys

from .cli import main

if __name__ == "__main__":
    sys.exit(main())
