#!/usr/bin/env python
"""Run doctests embedded in utility modules (the reference embeds doctests too)."""

import doctest
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from heybuddy_tpu.utils import strings

failed = 0
for module in (strings,):
    result = doctest.testmod(module, verbose=False)
    print(f"{module.__name__}: {result.attempted} tests, {result.failed} failed")
    failed += result.failed
sys.exit(1 if failed else 0)
