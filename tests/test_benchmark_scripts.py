"""Import-surface guard for the benchmark/harness scripts.

benchmarks/suite.py crashed for a whole round on a stale function-level
import (`_tree_tuple`, removed in round 3; fixed in 821eb3d) because CI
never touches the scripts — the driver runs bench.py only.  This test
walks EVERY import statement in every benchmarks/ script (including
imports nested inside functions, where the crash actually lived) and
resolves each imported project symbol, without executing any device
code.  VERDICT r4 item 4.
"""

import ast
import importlib
import pathlib
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
SCRIPTS = sorted(p for p in (REPO / "benchmarks").rglob("*.py")
                 if "__pycache__" not in p.parts)
SCRIPTS += [REPO / "bench.py", REPO / "__graft_entry__.py"]
_PROJECT_ROOTS = ("wavelets_tpu", "benchmarks")


@pytest.mark.parametrize(
    "path", SCRIPTS, ids=lambda p: str(p.relative_to(REPO)))
def test_script_imports_resolve(path):
    if str(REPO) not in sys.path:
        sys.path.insert(0, str(REPO))
    tree = ast.parse(path.read_text(), filename=str(path))
    checked = 0
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom):
            if node.level or not node.module:
                continue
            if node.module.split(".")[0] not in _PROJECT_ROOTS:
                continue
            mod = importlib.import_module(node.module)
            for alias in node.names:
                if alias.name == "*":
                    continue
                if not hasattr(mod, alias.name):
                    # `from package import submodule` resolves by import,
                    # not attribute
                    try:
                        importlib.import_module(
                            f"{node.module}.{alias.name}")
                    except ImportError:
                        pytest.fail(
                            f"{path.name}: 'from {node.module} import "
                            f"{alias.name}' does not resolve (stale "
                            f"import — the suite.py _tree_tuple crash "
                            f"class)")
                checked += 1
        elif isinstance(node, ast.Import):
            for alias in node.names:
                if alias.name.split(".")[0] in _PROJECT_ROOTS:
                    importlib.import_module(alias.name)
                    checked += 1
    # every script under benchmarks/ is expected to touch the project
    assert checked or path.name in ("overlap_probe.py",), (
        f"{path.name}: no project imports found — test is not covering it")


@pytest.mark.slow
def test_cpu_safe_harnesses_execute():
    """Execute (not just import) the harnesses that can run on CPU:
    the reference grid in --quick mode and the scaling projection.
    Catches run-time crashes the import guard cannot (the other half of
    VERDICT r4 item 4's ask)."""
    import subprocess
    r = subprocess.run(
        [sys.executable, str(REPO / "benchmarks" / "suite.py"),
         "--quick", "--json", "--force-cpu-full"],
        capture_output=True, text=True, cwd=REPO, timeout=900)
    assert r.returncode == 0, r.stdout[-1500:] + r.stderr[-1500:]
    rows = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
    assert len(rows) >= 10, f"only {len(rows)} grid rows"
    r = subprocess.run(
        [sys.executable, str(REPO / "benchmarks" / "scaling_projection.py"),
         "--out", "/tmp/_scaling_test.json"],
        capture_output=True, text=True, cwd=REPO, timeout=300)
    assert r.returncode == 0, r.stdout[-1500:] + r.stderr[-1500:]
