#!/usr/bin/env python3
# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
"""Dependency-free lint gate (CI `lint` job).

The reference CI gates on isort+black (reference: .github/workflows/ci.yaml);
this container has neither, so the gate is a self-contained AST lint that
enforces what actually catches bugs and diff noise:

- files parse (syntax gate)
- no unused imports (module scope; `__init__.py` re-exports and
  `# noqa`-marked lines are exempt)
- stdlib / third-party / first-party import blocks are not interleaved
  at module top level (isort's grouping rule, without the tool)
- no tabs, no trailing whitespace, newline at EOF

Usage: python scripts/lint.py [paths...]   (default: repo tree)
"""

from __future__ import annotations

import ast
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
FIRST_PARTY = {"ava256_tpu", "train", "render", "eval", "download", "tests",
               "generate_id_cond", "kbench", "__graft_entry__"}
STDLIB = set(getattr(sys, "stdlib_module_names", ()))


def _group(mod: str) -> int:
    root = mod.split(".")[0]
    if root in FIRST_PARTY:
        return 2
    if root in STDLIB or root == "__future__":
        return 0
    return 1


def _used_names(tree: ast.AST) -> set[str]:
    used: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            n = node
            while isinstance(n, ast.Attribute):
                n = n.value
            if isinstance(n, ast.Name):
                used.add(n.id)
    return used


def lint_file(path: Path) -> list[str]:
    errors: list[str] = []
    text = path.read_text()
    if text and not text.endswith("\n"):
        errors.append(f"{path}: missing newline at EOF")
    lines = text.split("\n")
    for i, line in enumerate(lines, 1):
        if "\t" in line:
            errors.append(f"{path}:{i}: tab character")
        if line != line.rstrip():
            errors.append(f"{path}:{i}: trailing whitespace")
    try:
        tree = ast.parse(text, filename=str(path))
    except SyntaxError as e:
        return errors + [f"{path}:{e.lineno}: syntax error: {e.msg}"]

    noqa = {i for i, line in enumerate(lines, 1) if "# noqa" in line}
    used = _used_names(tree)
    is_init = path.name == "__init__.py"

    # module-scope imports only: function-local imports are a deliberate
    # lazy-loading pattern here (jax/torch import cost). The grouping rule
    # applies to the leading import block only — imports placed after code
    # (e.g. after an importorskip or a codec registration) are deliberate.
    body = tree.body
    lead_end = len(body)
    for i, node in enumerate(body):
        if isinstance(node, (ast.Import, ast.ImportFrom)):
            continue
        if i == 0 and isinstance(node, ast.Expr) and isinstance(
            node.value, ast.Constant
        ):
            continue  # module docstring
        lead_end = i
        break
    top_imports: list[tuple[int, int, str]] = []  # (lineno, group, mod)
    for i, node in enumerate(body):
        in_lead = i < lead_end
        if isinstance(node, ast.Import):
            for a in node.names:
                if in_lead:
                    top_imports.append((node.lineno, _group(a.name), a.name))
                bound = (a.asname or a.name).split(".")[0]
                if not is_init and node.lineno not in noqa and bound not in used:
                    errors.append(f"{path}:{node.lineno}: unused import {a.name}")
        elif isinstance(node, ast.ImportFrom):
            mod = node.module or ""
            if mod == "__future__":
                continue  # never bound as a runtime name
            if in_lead:
                top_imports.append((node.lineno, 2 if node.level else _group(mod), mod))
            for a in node.names:
                if a.name == "*":
                    continue
                bound = a.asname or a.name
                if not is_init and node.lineno not in noqa and bound not in used:
                    errors.append(
                        f"{path}:{node.lineno}: unused import {mod}.{a.name}"
                    )

    # grouping: once a later group starts, an earlier group may not reappear
    seen_max = -1
    warned = set()
    for lineno, grp, mod in top_imports:
        if grp < seen_max and (grp, seen_max) not in warned:
            errors.append(
                f"{path}:{lineno}: import {mod!r} (group {grp}) after a "
                f"group-{seen_max} import — keep stdlib/third-party/"
                "first-party blocks ordered"
            )
            warned.add((grp, seen_max))
        seen_max = max(seen_max, grp)
    return errors


def main() -> int:
    args = [Path(a) for a in sys.argv[1:]]
    if not args:
        args = [REPO]
    files: list[Path] = []
    for a in args:
        if a.is_dir():
            files.extend(
                p for p in sorted(a.rglob("*.py"))
                if ".git" not in p.parts and "run-flagship" not in p.parts
            )
        else:
            files.append(a)
    all_errors: list[str] = []
    for f in files:
        all_errors.extend(lint_file(f))
    for e in all_errors:
        print(e)
    print(f"lint: {len(files)} files, {len(all_errors)} errors")
    return 1 if all_errors else 0


if __name__ == "__main__":
    sys.exit(main())
