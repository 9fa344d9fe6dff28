"""Dump ``explain("formatted")`` for registered queries to files.

The optimization-round deliverable: ``plans/r<N>/<query>_{before,after}.txt``
— the physical plan evidence the judge checks claims against. Compile
only, no execution (same discipline as tools/plancheck.py).

    python tools/explain_query.py SF_DIR OUT_DIR SUFFIX QUERY [QUERY ...]

writes ``OUT_DIR/<query>_<SUFFIX>.txt`` per query.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    if len(sys.argv) < 5:
        print(__doc__)
        return 2
    sf_dir, out_dir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
    names = sys.argv[4:]
    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__ as entrymod
    from emission_project_spark.session import get_spark

    spark = get_spark(
        "explain", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    rc = 0
    for name in names:
        if name not in qs:
            print(f"SKIP {name}: not registered")
            rc = 1
            continue
        df = qs[name](spark, sf_dir)
        # noop write is how the bench executes it, but explain on the
        # DataFrame shows the same computation plan
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    spark.stop()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
