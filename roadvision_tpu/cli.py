"""Console entry points (``[project.scripts]`` in pyproject.toml).

The operational CLIs live as standalone scripts at the repo root and in
``tools/`` — runnable directly (``python tools/detect.py``, the
reference's script-per-task convention, /root/reference/tools/
fog_batch.py:36-45) — and double as package entry points here:

    rvt-preview   = main_preview.py   (realtime pipeline + record)
    rvt-detect    = tools/detect.py   (offline detection)
    rvt-track     = tools/track.py    (offline tracking, MOT output)
    rvt-train     = tools/train.py    (YOLO training)
    rvt-serve     = tools/serve.py    (headless MJPEG live server)
    rvt-analyze   = tools/analyze.py  (offline traffic-analytics report)
    rvt-bench     = bench.py          (the benchmark harness)

Resolution order: a repo checkout first (``tools`` importable from the
working tree / an editable install), then the copies shipped inside the
wheel as ``roadvision_tpu.tools`` (see ``[tool.setuptools.package-dir]``).
"""
from __future__ import annotations

import importlib
import sys
from typing import Optional


def _run(names: list, argv: Optional[list] = None) -> int:
    last_err: Optional[BaseException] = None
    for name in names:
        try:
            mod = importlib.import_module(name)
        except ImportError as exc:
            last_err = exc
            continue
        return int(mod.main(argv) or 0)
    raise SystemExit(
        f"entry point unavailable: none of {names} importable "
        f"({last_err}) — run from a repo checkout or reinstall the package")


def preview(argv: Optional[list] = None) -> int:
    return _run(["main_preview", "roadvision_tpu.tools.main_preview"], argv)


def detect(argv: Optional[list] = None) -> int:
    return _run(["tools.detect", "roadvision_tpu.tools.detect"], argv)


def track(argv: Optional[list] = None) -> int:
    return _run(["tools.track", "roadvision_tpu.tools.track"], argv)


def train(argv: Optional[list] = None) -> int:
    return _run(["tools.train", "roadvision_tpu.tools.train"], argv)


def serve(argv: Optional[list] = None) -> int:
    return _run(["tools.serve", "roadvision_tpu.tools.serve"], argv)


def analyze(argv: Optional[list] = None) -> int:
    return _run(["tools.analyze", "roadvision_tpu.tools.analyze"], argv)


def bench(argv: Optional[list] = None) -> int:
    del argv  # bench.py is env-var driven (RVT_BENCH_*), no argv
    for name in ("bench", "roadvision_tpu.tools.bench"):
        try:
            mod = importlib.import_module(name)
        except ImportError:
            continue
        return int(mod.main() or 0)
    raise SystemExit("bench.py not importable — run from a repo checkout")


if __name__ == "__main__":  # python -m roadvision_tpu.cli <name> [args]
    cmds = {"preview": preview, "detect": detect, "track": track,
            "train": train, "serve": serve, "bench": bench,
            "analyze": analyze}
    if len(sys.argv) < 2 or sys.argv[1] not in cmds:
        raise SystemExit(f"usage: python -m roadvision_tpu.cli "
                         f"{{{'|'.join(cmds)}}} [args...]")
    raise SystemExit(cmds[sys.argv[1]](sys.argv[2:]))
