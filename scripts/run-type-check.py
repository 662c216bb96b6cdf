#!/usr/bin/env python
"""
Static type gate (reference scripts/run-type-check.sh runs mypy --strict on
every file; reference setup.cfg mypy section).

Runs ``mypy --strict`` over heybuddy_tpu when mypy is installed. This image
does not ship mypy, so the fallback is a built-in AST gate that enforces the
strict-mode surface the project controls: every public function/method in
the package must carry parameter and return annotations. The gate FAILS on
violations either way — it is a check, not a no-op.

Usage: python scripts/run-type-check.py [--list]
"""

from __future__ import annotations

import ast
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PACKAGE = os.path.join(REPO, "heybuddy_tpu")


def run_mypy() -> int:
    print("mypy found: running mypy --strict heybuddy_tpu")
    return subprocess.call(
        [sys.executable, "-m", "mypy", "--strict", "--ignore-missing-imports",
         PACKAGE],
        cwd=REPO,
    )


def annotation_gate(list_only: bool) -> int:
    failures: list[str] = []
    for root, _dirs, files in os.walk(PACKAGE):
        for fname in sorted(files):
            if not fname.endswith(".py"):
                continue
            path = os.path.join(root, fname)
            rel = os.path.relpath(path, REPO)
            with open(path, encoding="utf-8") as f:
                tree = ast.parse(f.read(), filename=rel)

            # public API = module-level functions and class methods; local
            # closures (jitted steps, pallas kernel bodies) are not surface
            def surface(parent: ast.AST):
                for child in ast.iter_child_nodes(parent):
                    if isinstance(child, (ast.FunctionDef, ast.AsyncFunctionDef)):
                        yield child
                    elif isinstance(child, (ast.ClassDef, ast.Module,
                                            ast.If, ast.Try)):
                        yield from surface(child)

            for node in surface(tree):
                if node.name.startswith("_") and node.name != "__init__":
                    continue
                # public API surface: require a return annotation...
                missing = []
                if node.returns is None and node.name != "__init__":
                    missing.append("return")
                # ...and annotations on every named parameter (self/cls free)
                args = node.args
                for a in args.args + args.kwonlyargs + args.posonlyargs:
                    if a.arg in ("self", "cls"):
                        continue
                    if a.annotation is None:
                        missing.append(a.arg)
                if missing:
                    failures.append(
                        f"{rel}:{node.lineno} {node.name}: "
                        f"unannotated {', '.join(missing)}"
                    )
    if failures:
        for f in failures:
            print(f"FAIL {f}")
        print(f"\n{len(failures)} public definitions missing annotations")
        return 0 if list_only else 1
    print("annotation gate: all public definitions fully annotated")
    return 0


def main() -> int:
    list_only = "--list" in sys.argv
    try:
        import mypy  # noqa: F401

        return run_mypy()
    except ImportError:
        print("mypy not installed: falling back to the built-in annotation gate")
        return annotation_gate(list_only)


if __name__ == "__main__":
    sys.exit(main())
