"""``python -m img2latex_tpu`` launches the CLI (reference ``__main__.py:1-8``)."""

import sys

from img2latex_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main())
