"""Doc-honesty checks.

``docs/MIGRATION.md`` promises a symbol-for-symbol map from the reference
to this framework; this test parses every framework citation out of it
and verifies the cited module and symbol actually exist, so the guide
cannot rot silently as the API evolves.
"""

import importlib
import inspect
import os
import re

from conftest import REPO_ROOT

REPO = str(REPO_ROOT)
PKG = "defensive_model_vae_tpu"

# first path segments (or exact top-level files) that denote framework
# modules — citations under these MUST resolve; anything else (reference
# file names, fixtures, tests, scripts) is out of scope here
_PKG_HEADS = {
    "models", "data", "control", "dnda", "metrics", "viz", "sut",
    "train", "ops", "parallel", "utils",
}
_PKG_TOP = {"pipeline.py", "scenarios.py", "generate.py", "cli.py",
            "serving.py"}

_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _framework_module(path):
    """Map a backticked `a/b.py` token to a package module, or None."""
    if not path.endswith(".py"):
        return None
    if path in _PKG_TOP or path.split("/")[0] in _PKG_HEADS:
        return PKG + "." + path[:-3].replace("/", ".")
    return None


def _symbol_known(mod, name):
    """name is a module attr, or a member/parameter of a class or function
    DEFINED in this package.  Imported modules (numpy, os, …) and foreign
    classes must not vouch for a name — ``dir(np)`` contains most common
    identifiers, which would make the check vacuous."""
    if hasattr(mod, name):
        return True
    for attr in vars(mod).values():
        if not (inspect.isclass(attr) or inspect.isfunction(attr)):
            continue
        if not getattr(attr, "__module__", "").startswith(PKG):
            continue
        if inspect.isclass(attr) and name in dir(attr):
            return True
        try:
            if name in inspect.signature(attr).parameters:
                return True
        except (TypeError, ValueError):
            continue
    return False


def test_migration_guide_symbols_exist():
    with open(os.path.join(REPO, "docs", "MIGRATION.md")) as f:
        text = f.read()

    problems = []
    checked = 0
    # validate per table-cell / bullet so identifiers attach to the
    # nearest preceding framework path within the same cell
    for cell in re.split(r"[|\n]", text):
        tokens = re.findall(r"`([^`]+)`", cell)
        mod = None
        for tok in tokens:
            modname = _framework_module(tok)
            if modname is not None:
                try:
                    mod = importlib.import_module(modname)
                except ImportError:
                    problems.append(f"cited module missing: {tok}")
                    mod = None
                continue
            if mod is not None and _IDENT.match(tok):
                checked += 1
                if not _symbol_known(mod, tok):
                    problems.append(f"{mod.__name__}: unknown symbol {tok}")
    assert not problems, problems
    # the guide cites well over a hundred symbols; a collapse in the
    # parse (format drift) should fail loudly, not pass vacuously
    assert checked > 100, f"only {checked} symbols parsed from the guide"


def test_quickstart_example_runs(tmp_path, monkeypatch):
    """examples/quickstart.py stays runnable end-to-end (train → sample →
    track → figures) on the bundled fixtures — in-process so it inherits
    the suite's CPU backend."""
    import runpy
    import sys

    monkeypatch.setattr(
        sys, "argv",
        ["quickstart.py", "--epochs", "200", "--outdir", str(tmp_path)],
    )
    runpy.run_path(
        str(REPO_ROOT / "examples" / "quickstart.py"), run_name="__main__"
    )
    for fig in ("loss.png", "generated_vs_training.png", "tracking.png"):
        assert (tmp_path / fig).stat().st_size > 0


def test_migration_guide_cli_subcommands_exist():
    with open(os.path.join(REPO, "docs", "MIGRATION.md")) as f:
        text = f.read()
    from defensive_model_vae_tpu import cli

    src = inspect.getsource(cli)
    real = set(re.findall(r"add_parser\(\s*[\"']([\w-]+)", src))
    cited = set(re.findall(r"`defvae ([\w-]+)`", text))
    # non-vacuity: a citation-format drift must fail loudly, not pass with
    # an empty cited set (the symbols test has the same guard)
    assert len(cited) >= 10, f"only {len(cited)} defvae citations parsed"
    missing = cited - real
    assert not missing, f"guide cites unknown CLI subcommands: {missing}"
