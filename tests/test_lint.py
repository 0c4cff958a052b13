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


def test_migrating_guide_paths_exist():
    """Every repo path MIGRATING.md cites must exist (doc-rot guard)."""
    import re

    root = pathlib.Path(__file__).resolve().parents[1]
    text = (root / "MIGRATING.md").read_text()
    # backticked tokens that look like file/dir paths; the "Here" column
    # cites package-relative paths (models/gfdn.py) — resolve those under
    # diffgfdn_tpu/ as well as at the repo root
    cited = {
        c
        for c in re.findall(r"`([\w][\w-]*/[\w/.-]+)`", text)
        if not c.startswith("src/")  # reference-side paths
        and not c.startswith("notebooks/")  # reference notebook paths
        and "data/config" not in c  # reference preset dir
    }
    assert len(cited) > 40, f"expected a dense map, found {len(cited)} paths"
    missing = sorted(
        c
        for c in cited
        if not (root / c).exists() and not (root / "diffgfdn_tpu" / c).exists()
    )
    assert not missing, f"MIGRATING.md cites nonexistent paths: {missing}"
