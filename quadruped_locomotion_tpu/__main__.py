"""``python -m quadruped_locomotion_tpu`` → operator CLI (api/cli.py)."""

from .api.cli import main

raise SystemExit(main())
