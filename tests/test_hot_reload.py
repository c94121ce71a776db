"""Config hot-reload (main_preview --watch-config; reference README's
future "Module 8" — README.md:18,187)."""
import os
import time

import yaml

import main_preview
from main_preview import ConfigWatcher


def _write(path, cfg):
    path.write_text(yaml.safe_dump(cfg))
    # ensure a strictly newer mtime even on coarse filesystems
    st = path.stat()
    os.utime(path, (st.st_atime, st.st_mtime + 1.0))


def _base_cfg():
    return {
        "camera": {"source": "synthetic:2", "width": 96, "height": 64},
        "preprocess": {"enabled": False},
        "detect": {"enabled": False},
        "tracking": {"enabled": False},
        "geometry": {"enabled": False},
        "vis": {"draw": {"det": True, "thickness": 2, "font_scale": 0.6}},
        "tpu": {"batch_size": 2},
    }


def test_watcher_detects_hot_section_change(tmp_path):
    p = tmp_path / "cfg.yaml"
    cfg = _base_cfg()
    _write(p, cfg)
    from roadvision_tpu.config import load_config
    w = ConfigWatcher(str(p), load_config(str(p)))
    assert w.poll() is None  # unchanged

    cfg["vis"]["draw"]["thickness"] = 5
    _write(p, cfg)
    fresh = w.poll()
    assert fresh is not None
    assert fresh["vis"]["draw"]["thickness"] == 5
    assert w.poll() is None  # consumed


def test_watcher_cold_change_warns_but_returns_none(tmp_path):
    p = tmp_path / "cfg.yaml"
    cfg = _base_cfg()
    _write(p, cfg)
    from roadvision_tpu.config import load_config
    w = ConfigWatcher(str(p), load_config(str(p)))

    cfg["detect"]["enabled"] = True  # compiled-in: restart required
    _write(p, cfg)
    # the project logger doesn't propagate to root; capture via a handler
    import logging
    records = []

    class Grab(logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    h = Grab()
    main_preview.log.addHandler(h)
    try:
        assert w.poll() is None
    finally:
        main_preview.log.removeHandler(h)
    assert any("need a restart" in m for m in records)


def test_watcher_survives_broken_yaml(tmp_path):
    p = tmp_path / "cfg.yaml"
    _write(p, _base_cfg())
    from roadvision_tpu.config import load_config
    w = ConfigWatcher(str(p), load_config(str(p)))
    p.write_text("{:::")
    st = p.stat()
    os.utime(p, (st.st_atime, st.st_mtime + 1.0))
    assert w.poll() is None  # logged + kept the old config


def test_driver_runs_with_watch_flag(tmp_path):
    p = tmp_path / "cfg.yaml"
    _write(p, _base_cfg())
    rc = main_preview.main(["--config", str(p), "--max-frames", "4",
                            "--no-show", "--watch-config"])
    assert rc == 0
