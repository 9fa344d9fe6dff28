"""Pin the driver-facing bench.py stdout contract (r13 verdict task #5).

The round driver runs ``bench.py`` and parses the LAST stdout line as
the record JSON. Round 12 lost the round-over-round comparison because
its record's final line did not parse on the driver side
(``PERF_r13.json`` ``prev_bench_ok: false`` — the r12 tail plainly
contains the record, but ``parsed`` came back empty), and nothing in
the tree pinned the contract. This test runs the real emission path —
a full subprocess ``bench.py`` invocation at sf0.001 with one sample
per query — and asserts every clause the driver depends on:

- exit code 0;
- the LAST stdout line is one complete JSON object (not merely "a line
  containing JSON somewhere above the tail");
- the record carries the contract keys
  (metric/value/unit/queries/sf) with the documented types;
- every HEADLINE query is present in ``queries`` (entries may be
  ADDED round-over-round, never removed — the driver diffs by name);
- the one-liner stays small enough that a bounded driver-side stdout
  tail still contains its start (the r12 failure mode class);
- the BENCH_OUT sidecar file holds the byte-identical record.

sf0.001 keeps this a planning-dominated smoke (~2-4 min); the timing
methodology itself is untouched — this test only pins the OUTPUT
contract.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata") + "/sf0.001"


def test_bench_stdout_last_line_is_the_record(tmp_path):
    out_file = tmp_path / "bench_out.json"
    env = dict(os.environ)
    env.update(
        {
            "SPARK_GRAFT_SF_DIR": SF_DIR,
            "BENCH_RUNS": "1",
            # a path that can never become a directory: the sf1 block's
            # generator fails fast and the block is skipped (the sf1
            # section is opt-in scale evidence, not part of the driver
            # stdout contract)
            "SPARK_GRAFT_SF1_DIR": "/dev/null/absent",
            "BENCH_OUT": str(out_file),
        }
    )
    env.pop("BENCH_SF10", None)
    env.pop("BENCH_PIPELINE", None)

    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert r.returncode == 0, f"bench.py failed: {r.stderr[-1000:]}"

    lines = [ln for ln in r.stdout.splitlines() if ln.strip()]
    assert lines, "bench.py printed nothing to stdout"
    last = lines[-1]

    # the driver parses THIS line and nothing else
    record = json.loads(last)

    assert record["metric"] == "headline_query_total"
    assert record["unit"] == "sec"
    assert isinstance(record["value"], (int, float)) and record["value"] > 0
    assert isinstance(record["queries"], dict) and record["queries"]
    assert record["sf"] == 0.001

    # every headline name must be present (add-only contract)
    import bench as benchmod

    missing = [q for q in benchmod.HEADLINE if q not in record["queries"]]
    assert not missing, f"headline queries missing from record: {missing}"

    # keep the one-liner bounded: a driver that captures a finite stdout
    # tail must still see the START of the line (r12 lost the round
    # comparison to exactly this class of failure). 16 KiB is ~2.5x the
    # r13 record; growth past it needs a deliberate decision, not drift.
    assert len(last) < 16384, f"record one-liner grew to {len(last)} bytes"

    # the committed sidecar (BENCH_LOCAL_r*.json) is the same record
    assert out_file.read_text().strip() == last
