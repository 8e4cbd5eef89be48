"""`python -m garden_tpu` — the asset-pipeline CLI (see cli.py)."""

import sys

from garden_tpu.cli import main

sys.exit(main())
