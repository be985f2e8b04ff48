"""`python -m occular_ocr_spark` — module entry (reference __main__.py:1-6)."""

import sys

from .cli import main

sys.exit(main())
