#!/usr/bin/env python
"""CLI entry point — drop-in equivalent of the reference's ``run.py``.

Same flags, same modes (train / resume / evaluate / render); see
``videopose3d_tpu/arguments.py`` for the full surface and
``videopose3d_tpu/runner.py`` for the driver.
"""

from videopose3d_tpu.runner import main

if __name__ == "__main__":
    main()
