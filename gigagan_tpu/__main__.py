"""`python -m gigagan_tpu` entry point (see gigagan_tpu/cli.py)."""

import sys

from gigagan_tpu.cli import main

sys.exit(main())
