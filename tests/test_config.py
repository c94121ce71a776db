"""Config layer semantics (reference parity: src/config.py:5-108)."""
import textwrap

from roadvision_tpu.config import DEFAULTS, load_config, merge, sanitize_none


def test_defaults_schema_sections():
    for section in ("camera", "preview", "preprocess", "detect", "tracking",
                    "geometry", "vis"):
        assert section in DEFAULTS
    assert DEFAULTS["detect"]["backend"] == "ultralytics"
    assert DEFAULTS["tracking"]["backend"] == "sort"
    assert DEFAULTS["geometry"]["projector"]["type"] == "homography"


def test_merge_recursive_and_wholesale():
    base = {"a": {"b": 1, "c": 2}, "lst": [1, 2], "x": 5}
    over = {"a": {"c": 3}, "lst": [9]}
    out = merge(base, over)
    assert out == {"a": {"b": 1, "c": 3}, "lst": [9], "x": 5}
    # base untouched
    assert base["a"]["c"] == 2


def test_merge_none_override():
    assert merge({"a": 1}, None) == {"a": 1}


def test_sanitize_none():
    assert sanitize_none(None) == {}
    assert sanitize_none({"a": None, "b": {"c": None}, "d": 1}) == {
        "a": {}, "b": {"c": {}}, "d": 1}


def test_load_config_default(tmp_path):
    cfg_file = tmp_path / "my.yaml"
    cfg_file.write_text(textwrap.dedent("""
        detect:
          enabled: true
          classes_keep: [0, 2, 3, 5, 7]
        tracking:
        """))
    cfg = load_config(str(cfg_file))
    assert cfg["detect"]["enabled"] is True
    assert cfg["detect"]["classes_keep"] == [0, 2, 3, 5, 7]
    # untouched defaults merged in
    assert cfg["detect"]["conf_thres"] == 0.25
    assert cfg["tracking"]["backend"] == "sort"  # None branch sanitized
    assert cfg["camera"]["width"] == 1280


def test_load_config_missing_raises(tmp_path):
    import pytest
    with pytest.raises(FileNotFoundError):
        load_config(str(tmp_path / "nope.yaml"))
