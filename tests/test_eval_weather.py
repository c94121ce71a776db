"""Weather-robustness benchmark (tools/eval_weather.py): the measured
artifact for the reference's core promise — preprocess helps detection
in bad weather (reference README modules 1-3; auto-gate at
src/preprocess/pipeline.py:37-40). Small-scale structural checks here;
the checked-in WEATHER.json carries the full 96-frame run."""
import json
import sys
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from tools import eval_weather  # noqa: E402


def _run(tmp_path, levels, modes, frames=12, gate_thresh=150.0,
         gate_impulse=2.5):
    out = tmp_path / "weather.json"
    eval_weather.main([
        "--frames", str(frames), "--vehicles", "4",
        "--levels", levels, "--modes", modes,
        "--gate-thresh", str(gate_thresh), "--batch", "4",
        "--gate-impulse", str(gate_impulse),
        "--out", str(out), "--device", "auto",  # conftest already on CPU
    ])
    return json.loads(out.read_text())


def test_structure_and_gate_separation(tmp_path):
    rep = _run(tmp_path, "none,heavy", "off,auto")
    assert set(rep["levels"]) == {"none", "heavy"}
    for lv in ("none", "heavy"):
        entry = rep["levels"][lv]
        assert set(entry["modes"]) == {"off", "auto"}
        for m in entry["modes"].values():
            for k in ("map50", "recall50", "conf_matched_mean",
                      "mota", "idf1", "hota"):
                assert -1.0 <= m[k] <= 1.0, (lv, k, m[k])
    # the reference-exact span statistic separates clean from the
    # reference-tool fog (global_veil=0.5): gate never runs on clean,
    # always on heavy
    assert rep["levels"]["none"]["gate_run_frac"] == 0.0
    assert rep["levels"]["heavy"]["gate_run_frac"] == 1.0
    # fog degrades the un-preprocessed detector (the premise)
    assert rep["levels"]["heavy"]["modes"]["off"]["map50"] \
        < rep["levels"]["none"]["modes"]["off"]["map50"]
    # on clean frames the auto-gate skips the whole chain, so auto is
    # BIT-equal to off (jnp.where passthrough of the raw frames)
    assert rep["levels"]["none"]["modes"]["auto"] \
        == rep["levels"]["none"]["modes"]["off"]


def test_rain_level_and_matched_conf(tmp_path):
    # contrast statistics are structurally BLIND to impulse rain (noise
    # raises the gray span): with the impulse statistic disabled, the
    # span gate never runs — the r4 failure mode WEATHER.json measured
    rep = _run(tmp_path, "rain", "off,on", gate_impulse=0.0)
    entry = rep["levels"]["rain"]
    assert entry["gate_run_frac"] == 0.0
    for m in entry["modes"].values():
        assert m["conf_matched_mean"] > 0.0


def test_rain_gated_by_impulse_statistic(tmp_path):
    # ... and the r5 fix: the impulse-residual statistic (mean
    # |gray − median3| on the stride-4 subsample) sees the rain the
    # span cannot, so the auto-gate runs the chain (whose MedianDerain
    # op exists precisely for this) on every rained frame
    rep = _run(tmp_path, "rain,none", "off,auto")
    assert rep["levels"]["rain"]["gate_run_frac"] == 1.0
    assert rep["levels"]["rain"]["impulse_mean"] \
        > rep["levels"]["none"]["impulse_mean"]
    # clean frames stay below the impulse threshold: auto == off
    assert rep["levels"]["none"]["gate_run_frac"] == 0.0
    assert rep["levels"]["none"]["modes"]["auto"] \
        == rep["levels"]["none"]["modes"]["off"]


def test_fog_is_deterministic():
    frames, _ = eval_weather.build_scene(3, 128, 3, seed=1)
    a = eval_weather.fog_level(frames, "medium", seed=7)
    b = eval_weather.fog_level(frames, "medium", seed=7)
    assert np.array_equal(a, b)
    # temporally frozen: the same atmospheric draw on every frame means
    # two identical input frames give identical fogged frames
    same = np.repeat(frames[:1], 2, axis=0)
    f2 = eval_weather.fog_level(same, "medium", seed=7)
    assert np.array_equal(f2[0], f2[1])
