"""Smoke-test every bench.py metric function on tiny (--quick) shapes.

Round-3 shipped a bench.py shape regression (FGN fed 2*f_in into a model
initialized at f_in) that no test caught because nothing exercised
bench.py; the driver's BENCH_r03 run then had no FGN numbers. This test
imports bench.py and runs EVERY registered metric with quick=True on the
CPU backend so an input-shape / API mismatch in any metric fails CI
instead of silently dropping benchmark coverage.

Each metric prints its JSON line; we parse it from capsys and check the
contract bench.py promises the driver: keys metric/value/unit/vs_baseline
with a finite positive value.
"""

import json
import math

import pytest

import bench


@pytest.mark.parametrize("name", sorted(bench.METRICS))
def test_metric_quick_smoke(name, capsys):
    bench.METRICS[name](True)  # quick=True
    lines = [
        ln for ln in capsys.readouterr().out.splitlines() if ln.startswith("{")
    ]
    assert lines, f"metric {name} printed no JSON line"
    for ln in lines:
        rec = json.loads(ln)
        for key in ("metric", "value", "unit", "vs_baseline"):
            assert key in rec, f"{name}: missing {key} in {rec}"
        assert math.isfinite(rec["value"]) and rec["value"] > 0, (
            f"{name}: bad value {rec['value']}"
        )


def test_every_metric_is_scheduled():
    """FULL_ORDER must cover every registered metric (and only those),
    so adding a metric without scheduling it can't silently drop it."""
    assert {n for n, _ in bench.FULL_ORDER} == set(bench.METRICS)


def test_rotation_order_headline_first_then_stalest(tmp_path, monkeypatch):
    """Rotation: the headline group always runs first; the rest order
    stalest-first by BENCH_ROTATION.json, with never-recorded groups
    (absent from the file) ahead of recorded ones."""
    rot = tmp_path / "rot.json"
    monkeypatch.setattr(bench, "ROTATION_FILE", str(rot))

    # No rotation file: declaration order, headline first.
    names = [g[0] for g in bench._rotation_order(bench.GROUPS)]
    assert names[0] == "forecaster_1deg"
    assert names == [g[0] for g in bench.GROUPS]

    # Mark two groups as recently recorded: they move to the END, the
    # headline stays first, never-recorded groups keep declaration order.
    bench._rotation_mark("fgn")
    bench._rotation_mark("genda")
    names = [g[0] for g in bench._rotation_order(bench.GROUPS)]
    assert names[0] == "forecaster_1deg"
    assert names[-1] == "genda" and names[-2] == "fgn"
    unrecorded = [
        g[0] for g in bench.GROUPS
        if g[0] not in ("forecaster_1deg", "fgn", "genda")
    ]
    assert names[1:-2] == unrecorded

    # The mark file is valid JSON with float timestamps.
    data = json.loads(rot.read_text())
    assert set(data) == {"fgn", "genda"}
    assert all(isinstance(v, float) for v in data.values())


def test_committed_rotation_file_names_real_groups():
    """BENCH_ROTATION.json (committed seed) must only name real groups."""
    import os

    path = os.path.join(os.path.dirname(bench.__file__), "BENCH_ROTATION.json")
    data = json.load(open(path))
    assert set(data) <= {g[0] for g in bench.GROUPS}
