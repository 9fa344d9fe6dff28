"""Interleaved fresh-JVM A/B that also records tree-cumulative minor
page faults (the causal metric for allocation-shape changes — r13 §A
protocol, now via ``os.wait4`` instead of ad-hoc /proc sampling).

    python tools/ab_minflt.py QUERY SF_DIR OLD_REF [N]

Old arm = clean ``git archive`` export of OLD_REF (same discipline as
benchdiff --ab-run); new arm = this worktree. Each sample is one
``tools/time_query.py`` child; wait4's rusage is the child plus every
descendant it reaped (the py4j JVM and its Python workers) — a number
in the low hundreds of thousands means the JVM escaped reaping and the
sample is void (all samples here read millions, JVM included).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile


def main() -> int:
    if len(sys.argv) < 4:
        print(__doc__)
        return 2
    query, sf_dir, old_ref = sys.argv[1], os.path.abspath(sys.argv[2]), sys.argv[3]
    n = int(sys.argv[4]) if len(sys.argv) > 4 else 5
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    child = os.path.join(repo, "tools", "time_query.py")

    tmp = tempfile.mkdtemp(prefix="ab-minflt-")
    ar = subprocess.run(
        ["git", "-C", repo, "archive", old_ref], capture_output=True, check=True
    )
    subprocess.run(["tar", "-x", "-C", tmp], input=ar.stdout, check=True)
    print(f"old = git archive {old_ref} -> {tmp}")

    res: dict[str, list[tuple[float, int]]] = {"old": [], "new": []}
    for i in range(n):
        for side, cwd in (("old", tmp), ("new", repo)):
            p = subprocess.Popen(
                [sys.executable, child, sf_dir, query],
                cwd=cwd, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
                text=True,
            )
            out = p.stdout.read()
            _, status, ru = os.wait4(p.pid, 0)
            secs = None
            for line in reversed(out.splitlines()):
                if line.strip().startswith("{"):
                    try:
                        secs = json.loads(line)["seconds"]
                        break
                    except (json.JSONDecodeError, KeyError):
                        continue
            if secs is None or status != 0:
                print(f"{side} child failed (status {status})")
                return 2
            res[side].append((secs, ru.ru_minflt))
            print(f"[{i+1}/{n}] {side}: {secs:.3f}s  minflt={ru.ru_minflt}")
    for side in ("old", "new"):
        ss = sorted(s for s, _ in res[side])
        fs = sorted(f for _, f in res[side])
        print(
            f"{query} {side}: n={n} wall median {ss[n // 2]:.3f}s "
            f"[{ss[0]:.3f}..{ss[-1]:.3f}]  minflt median {fs[n // 2]} "
            f"[{fs[0]}..{fs[-1]}]"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
