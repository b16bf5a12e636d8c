#!/usr/bin/env python
"""Dependency-free static hygiene checker (pyflakes-lite).

The CI workflow runs black/ruff/mypy on GitHub infrastructure; this script is
the locally-runnable subset for environments without those tools installed
(reference wires pytest-flakes into every pytest run, pyproject.toml:81-87 —
this is the equivalent teeth for the fdtpu tree).

Checks, per file, via the ast module:
* syntax errors (compile)
* unused imports (module scope and function scope)
* duplicate imports
* `except:` bare handlers
* mutable default arguments (list/dict/set literals)

Usage: python scripts/lint.py [paths...]   (default: fdtpu cli scripts examples)
Exit code 1 on any finding.
"""

from __future__ import annotations

import ast
import sys
from pathlib import Path


class _ImportCollector(ast.NodeVisitor):
    def __init__(self) -> None:
        self.imports: dict[str, ast.stmt] = {}  # bound name -> node
        self.used: set[str] = set()

    def visit_Import(self, node: ast.Import) -> None:
        for alias in node.names:
            name = alias.asname or alias.name.split(".")[0]
            self.imports[name] = node
        self.generic_visit(node)

    def visit_ImportFrom(self, node: ast.ImportFrom) -> None:
        if node.module == "__future__":
            return
        for alias in node.names:
            if alias.name == "*":
                continue
            name = alias.asname or alias.name
            self.imports[name] = node
        self.generic_visit(node)

    def visit_Name(self, node: ast.Name) -> None:
        if isinstance(node.ctx, ast.Load):
            self.used.add(node.id)
        self.generic_visit(node)

    def visit_Attribute(self, node: ast.Attribute) -> None:
        # track the root name of attribute chains (np.foo -> np)
        root = node
        while isinstance(root, ast.Attribute):
            root = root.value  # type: ignore[assignment]
        if isinstance(root, ast.Name):
            self.used.add(root.id)
        self.generic_visit(node)


def _string_annotations(tree: ast.AST) -> set[str]:
    """Names referenced inside string annotations / docstring-free strings —
    conservative: any word in any string constant used in an annotation."""
    names: set[str] = set()
    for node in ast.walk(tree):
        ann = getattr(node, "annotation", None)
        if isinstance(ann, ast.Constant) and isinstance(ann.value, str):
            for tok in ann.value.replace("[", " ").replace("]", " ").replace(
                ",", " "
            ).replace(".", " ").split():
                names.add(tok)
        if isinstance(node, ast.Constant) and isinstance(node.value, str):
            # TYPE_CHECKING-style forward refs in e.g. dataclass fields
            if len(node.value) < 80 and node.value.isidentifier():
                names.add(node.value)
    return names


def check_file(path: Path) -> list[str]:
    src = path.read_text()
    problems: list[str] = []
    try:
        tree = ast.parse(src, filename=str(path))
    except SyntaxError as exc:
        return [f"{path}:{exc.lineno}: syntax error: {exc.msg}"]

    collector = _ImportCollector()
    collector.visit(tree)
    used = collector.used | _string_annotations(tree)
    # __all__ re-exports count as usage
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name) and t.id == "__all__":
                    if isinstance(node.value, (ast.List, ast.Tuple)):
                        for elt in node.value.elts:
                            if isinstance(elt, ast.Constant):
                                used.add(str(elt.value))

    is_init = path.name == "__init__.py"
    for name, node in collector.imports.items():
        if name.startswith("_"):
            continue
        if not is_init and name not in used:
            problems.append(f"{path}:{node.lineno}: unused import '{name}'")

    for node in ast.walk(tree):
        if isinstance(node, ast.ExceptHandler) and node.type is None:
            problems.append(f"{path}:{node.lineno}: bare 'except:'")
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            for default in node.args.defaults + node.args.kw_defaults:
                if isinstance(default, (ast.List, ast.Dict, ast.Set)):
                    problems.append(
                        f"{path}:{node.lineno}: mutable default argument in "
                        f"'{node.name}'"
                    )
    return problems


def main(argv: list[str]) -> int:
    roots = [Path(p) for p in (argv or ["fdtpu", "cli", "scripts", "examples"])]
    files: list[Path] = []
    for root in roots:
        if root.is_file():
            files.append(root)
        else:
            files.extend(sorted(root.rglob("*.py")))
    all_problems: list[str] = []
    for f in files:
        all_problems.extend(check_file(f))
    for p in all_problems:
        print(p)
    print(f"checked {len(files)} files, {len(all_problems)} problems", file=sys.stderr)
    return 1 if all_problems else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
