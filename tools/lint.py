#!/usr/bin/env python
"""Dependency-free lint for diffgfdn_tpu (this image has no flake8/ruff).

Checks, per file:
* syntax (ast.parse),
* unused imports (names imported but never referenced),
* tabs in indentation and trailing whitespace,
* lines longer than 100 characters (reported, non-fatal unless --strict).

Run:  python tools/lint.py [paths...]   (defaults to the package + tests)
Exit: 0 clean, 1 findings.
"""

import ast
import sys
from pathlib import Path

MAX_LINE = 100


def _imported_names(tree):
    """{local name -> lineno} for every import in the module."""
    out = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                name = (a.asname or a.name).split(".")[0]
                out[name] = node.lineno
        elif isinstance(node, ast.ImportFrom):
            for a in node.names:
                if a.name == "*":
                    continue
                out[a.asname or a.name] = node.lineno
    return out


def _used_names(tree):
    used = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            base = node
            while isinstance(base, ast.Attribute):
                base = base.value
            if isinstance(base, ast.Name):
                used.add(base.id)
    return used


def lint_file(path: Path, strict: bool = False):
    findings = []
    text = path.read_text()
    try:
        tree = ast.parse(text, filename=str(path))
    except SyntaxError as exc:
        return [f"{path}:{exc.lineno}: syntax error: {exc.msg}"]

    # unused imports ("# noqa" on the line suppresses)
    lines = text.splitlines()
    used = _used_names(tree)
    # names re-exported via __all__ count as used
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign):
            for tgt in node.targets:
                if isinstance(tgt, ast.Name) and tgt.id == "__all__":
                    if isinstance(node.value, (ast.List, ast.Tuple)):
                        for elt in node.value.elts:
                            if isinstance(elt, ast.Constant):
                                used.add(str(elt.value))
    is_init = path.name == "__init__.py"
    if not is_init:  # __init__ re-exports are the package surface
        for name, lineno in _imported_names(tree).items():
            if name not in used and "noqa" not in lines[lineno - 1]:
                findings.append(f"{path}:{lineno}: unused import '{name}'")

    for i, line in enumerate(lines, 1):
        if line != line.rstrip():
            findings.append(f"{path}:{i}: trailing whitespace")
        if "\t" in line:
            findings.append(f"{path}:{i}: tab character")
        if len(line) > MAX_LINE and strict:
            findings.append(f"{path}:{i}: line longer than {MAX_LINE}")
    return findings


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    strict = "--strict" in argv
    paths = [a for a in argv if not a.startswith("-")]
    root = Path(__file__).resolve().parents[1]
    if not paths:
        paths = [str(root / "diffgfdn_tpu"), str(root / "tests"),
                 str(root / "bench.py"), str(root / "__graft_entry__.py")]
    files = []
    for p in paths:
        p = Path(p)
        files.extend(sorted(p.rglob("*.py")) if p.is_dir() else [p])
    findings = []
    for f in files:
        findings.extend(lint_file(f, strict=strict))
    for f in findings:
        print(f)
    print(f"{len(files)} files checked, {len(findings)} findings")
    return 1 if findings else 0


if __name__ == "__main__":
    sys.exit(main())
