"""Package entry points (roadvision_tpu/cli.py + pyproject.toml scripts)."""
import subprocess
import sys

import pytest

from roadvision_tpu import cli


def test_all_declared_entry_points_exist():
    # keep pyproject's [project.scripts] and cli.py in sync
    import tomllib
    with open("pyproject.toml", "rb") as f:
        meta = tomllib.load(f)
    for script, target in meta["project"]["scripts"].items():
        mod, fn = target.split(":")
        assert mod == "roadvision_tpu.cli"
        assert callable(getattr(cli, fn)), f"{script} -> {target} missing"


def test_detect_entry_dispatches_to_tool():
    with pytest.raises(SystemExit) as ei:
        cli.detect(["--help"])
    assert ei.value.code == 0


def test_run_reports_unimportable_targets():
    with pytest.raises(SystemExit, match="entry point unavailable"):
        cli._run(["no.such.module", "also.not.there"])


def test_module_usage_error():
    p = subprocess.run([sys.executable, "-m", "roadvision_tpu.cli"],
                       capture_output=True, text=True)
    assert p.returncode != 0
    assert "usage:" in p.stderr
