"""benchdiff per-section steal gate (round 12, r11 verdict task #4).

The r11 windows demonstrated that the WHOLE-RUN steal integral hides
stolen sections: BENCH_LOCAL_r11 read 4.97% overall from a ruined sf10
section beside a near-quiet sf1 block, and r11c the mirror image
(stolen headline, quiet sf1). These tests reproduce both shapes with
synthetic records and pin the new behavior: only hard flags from a
CONTENDED section are refused; quiet sections' verdicts stand; legacy
records without section snapshots keep the whole-run screen.

No Spark needed — the tool is pure JSON-in/verdict-out.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

TOOL = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "tools", "benchdiff.py")


def _record(headline: dict, sf1: dict | None = None,
            steal: float | None = None, sections: dict | None = None) -> dict:
    rec = {"metric": "headline_query_total", "unit": "sec",
           "value": round(sum(headline.values()), 3), "queries": headline,
           "sf": 0.1, "cpu_calibration_py_s": 0.4,
           "cpu_calibration_py_mt_s": 0.5}
    if sf1 is not None:
        rec["sf1"] = {"queries": sf1, "value": round(sum(sf1.values()), 3)}
    if steal is not None:
        rec["cpu_steal_pct"] = steal
    if sections is not None:
        rec["cpu_steal_pct_sections"] = sections
    return rec


def _run(tmp_path, old: dict, new: dict) -> tuple[int, str]:
    pa, pb = str(tmp_path / "old.json"), str(tmp_path / "new.json")
    with open(pa, "w") as f:
        json.dump(old, f)
    with open(pb, "w") as f:
        json.dump(new, f)
    r = subprocess.run([sys.executable, TOOL, pa, pb],
                       capture_output=True, text=True)
    return r.returncode, r.stdout


# ten stable headline queries satisfy MIN_STABLE for self-calibration;
# the sf1 block carries ten stable + two x2-regressed heavies (which
# names land in SF1_HEAVY does not matter for the sf1 block: every sf1
# query is exit-driving there)
HEADLINE = {f"q{i}": 1.0 for i in range(10)}
SF1_OK = {f"h{i}": 10.0 for i in range(10)}


def test_contended_sf1_section_excludes_its_hard_flags(tmp_path):
    """r11 shape: quiet whole-run average CAN coexist with a stolen
    block — with sections present, the stolen block's regressions are
    refused (exit 0 + STEAL-EXCLUDED note), not failed."""
    old = _record(HEADLINE, {**SF1_OK, "hx": 10.0, "hy": 10.0},
                  steal=0.05, sections={"headline": 0.02, "sf1": 0.03})
    new = _record(HEADLINE, {**SF1_OK, "hx": 20.0, "hy": 22.0},
                  steal=2.0, sections={"headline": 0.02, "sf1": 8.0})
    rc, out = _run(tmp_path, old, new)
    assert "STEAL-EXCLUDED" in out
    assert "hx" in out and "hy" in out
    assert rc == 0


def test_quiet_sf1_section_regression_still_fails(tmp_path):
    """r11c mirror image: the HEADLINE section is stolen but sf1 is
    quiet — an sf1 regression is real signal and must still exit 1
    (the old whole-run screen would have returned INCONCLUSIVE)."""
    old = _record(HEADLINE, {**SF1_OK, "hx": 10.0},
                  steal=0.05, sections={"headline": 0.02, "sf1": 0.03})
    new = _record(HEADLINE, {**SF1_OK, "hx": 20.0},
                  steal=6.0, sections={"headline": 9.0, "sf1": 0.04})
    rc, out = _run(tmp_path, old, new)
    assert rc == 1
    assert "STEAL-EXCLUDED" not in out  # sf1 was quiet; verdict stands


def test_legacy_whole_run_screen_unchanged(tmp_path):
    """Records without section snapshots keep the round-9 behavior:
    whole-run steal > threshold + hard regressions = INCONCLUSIVE 3."""
    old = _record(HEADLINE, {**SF1_OK, "hx": 10.0}, steal=0.05)
    new = _record(HEADLINE, {**SF1_OK, "hx": 20.0}, steal=6.0)
    rc, out = _run(tmp_path, old, new)
    assert rc == 3
    assert "INCONCLUSIVE" in out
