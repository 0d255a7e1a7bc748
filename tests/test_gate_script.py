"""Contract pins for scripts/gate.py (the sharded pre-commit gate):
the three lanes must PARTITION the suite — fast-a's explicit file list
plus fast-b's ignore-complement plus the slow marker — so a renamed or
deleted shard file is caught here at collect time, and an emptied lane
is caught at run time by the explicit exit-code-5 handling (ADVICE r14
#5). Pure-python: no Spark session."""

from __future__ import annotations

import importlib.util
import os


def _gate():
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "kw_gate_script", os.path.join(here, "scripts", "gate.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod, here


def test_fast_a_shard_files_exist():
    gate, root = _gate()
    for f in gate.FAST_A + gate.SLOW_A:
        assert os.path.exists(os.path.join(root, f)), (
            f"gate shard file {f} no longer exists — fast-a would collect "
            "less than it claims (fast-b's ignore of it is then a no-op, "
            "so coverage is safe, but the balance profile is stale)"
        )


def test_lanes_are_disjoint_and_cover():
    """Each -b lane ignores exactly its -a lane's files; the slow pair
    and fast pair are marker complements — structural, so the
    full-collect equality check (run once per reshard, recorded in
    SURVEY) cannot silently drift."""
    gate, _ = _gate()
    for tier, files in (("fast", gate.FAST_A), ("slow", gate.SLOW_A)):
        b_ignores = {
            arg.split("=", 1)[1]
            for arg in gate.LANES[f"{tier}-b"]["args"]
            if arg.startswith("--ignore=")
        }
        assert b_ignores == set(files), tier
        assert gate.LANES[f"{tier}-a"]["args"][: len(files)] == files, tier
    assert "not slow" in gate.LANES["fast-a"]["args"]
    assert "not slow" in gate.LANES["fast-b"]["args"]
    assert "slow" in gate.LANES["slow-a"]["args"]
    assert "slow" in gate.LANES["slow-b"]["args"]
