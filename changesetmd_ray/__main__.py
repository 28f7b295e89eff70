"""``python -m changesetmd_ray`` — see :mod:`changesetmd_ray.cli`."""

import sys

from changesetmd_ray.cli import main

sys.exit(main())
