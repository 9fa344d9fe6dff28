"""The `ledger` subcommand: staleness fold over driver correctness
artifacts. No Spark — it must stay runnable on a bare checkout (it is
the rotation-planning tool)."""

from __future__ import annotations

import json
import os
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


@pytest.fixture()
def artifacts(tmp_path):
    """Two fake driver artifacts: q covered in r3 and re-verified in
    r5; r3-only names stay at 3."""
    from emission_project_spark.plans import registry

    registry.load_all()
    names = list(registry.QUERIES)
    a, b = names[0], names[1]
    (tmp_path / "CORRECTNESS_r03.json").write_text(
        json.dumps({a: {"match": True}, b: {"match": True}})
    )
    (tmp_path / "CORRECTNESS_r05.json").write_text(
        json.dumps({a: {"match": True}})
    )
    return str(tmp_path), a, b


def test_ledger_histogram_and_rotation(artifacts, capsys):
    from emission_project_spark.__main__ import _ledger

    d, a, b = artifacts
    rc = _ledger(os.path.join(d, "CORRECTNESS_r*.json"), window=2)
    out = capsys.readouterr().out
    assert rc == 0
    # a's latest round is 5 (max wins), b's is 3, everything else never
    assert "r5: 1" in out and "r3: 1" in out and "never:" in out
    # the two artifact-covered names are the first two registered, so
    # the current-window line shows exactly them
    assert "r3×1" in out and "r5×1" in out
    # rotation list leads with never-verified names, not a or b
    stale_section = out.split("stalest")[1]
    assert a not in stale_section and b not in stale_section


def test_ledger_no_artifacts(tmp_path):
    from emission_project_spark.__main__ import _ledger

    assert _ledger(os.path.join(str(tmp_path), "nope_*.json"), 50) == 2
