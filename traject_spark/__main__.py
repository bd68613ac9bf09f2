"""``python -m traject_spark`` == the traject-spark CLI (cli.py)."""

import sys

from traject_spark.cli import main

sys.exit(main())
