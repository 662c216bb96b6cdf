#!/usr/bin/env python
"""Import every heybuddy_tpu module (the reference's importchecker equivalent)."""

import importlib
import os
import pkgutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

import heybuddy_tpu

failures = []
for module_info in pkgutil.walk_packages(heybuddy_tpu.__path__, "heybuddy_tpu."):
    try:
        importlib.import_module(module_info.name)
        print(f"ok   {module_info.name}")
    except Exception as ex:  # noqa: BLE001
        failures.append((module_info.name, ex))
        print(f"FAIL {module_info.name}: {ex}")

if failures:
    sys.exit(1)
print(f"\nAll {sum(1 for _ in pkgutil.walk_packages(heybuddy_tpu.__path__, 'heybuddy_tpu.'))} modules import cleanly.")
