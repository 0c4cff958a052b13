"""The dependency-free lint gate (tools/lint.py): the tree stays clean.

Mirrors the reference's pre-commit lint stack (§5.2) in an image without
flake8/ruff; .pre-commit-config.yaml wires the same script as a local hook.
"""

import pathlib
import sys


def test_tree_is_lint_clean(capsys):
    root = pathlib.Path(__file__).resolve().parents[1]
    sys.path.insert(0, str(root / "tools"))
    import lint

    rc = lint.main([])
    out = capsys.readouterr().out
    assert rc == 0, f"lint findings:\n{out}"


def test_linter_catches_unused_import(tmp_path):
    root = pathlib.Path(__file__).resolve().parents[1]
    sys.path.insert(0, str(root / "tools"))
    import lint

    bad = tmp_path / "bad.py"
    bad.write_text("import os\nprint('hi')\t\n")
    findings = lint.lint_file(bad)
    assert any("unused import 'os'" in f for f in findings)
    assert any("tab character" in f for f in findings)
