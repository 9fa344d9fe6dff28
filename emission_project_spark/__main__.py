"""CLI entry point: ``python -m emission_project_spark <command>``.

The reference is driven by an Airflow DAG (``dags/emission-dag.py``);
the switch-over surface here is one idempotent batch command plus ad-hoc
query access to every registered operator — the two things a user of
the reference actually invokes.

Commands:
  pipeline --incoming DIR --warehouse DIR [--archive DIR]
      One scheduled ETL run (init → dims → fact), printing per-table
      insert counts — the ``emission-dag`` tick.
  query NAME [--sf-dir DIR] [--limit N] [--explain]
      Run a registered query against the testdata tables and print
      rows (or the formatted physical plan).
  list [--filter SUBSTR]
      List registered query names.
  ledger [--glob PATTERN] [--window N]
      Staleness histogram over the driver's CORRECTNESS_r*.json
      artifacts: latest verified round per registered query, the
      current verify window (the first N registered names), and the
      stalest names that should lead the NEXT round's window — so
      rotation planning is one command instead of a judge-side
      recomputation.
"""

from __future__ import annotations

import argparse
import sys


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="emission_project_spark")
    sub = p.add_subparsers(dest="command", required=True)

    pp = sub.add_parser("pipeline", help="run one ETL batch tick")
    pp.add_argument("--incoming", required=True, help="root of the feed dirs")
    pp.add_argument("--warehouse", required=True, help="warehouse directory")
    pp.add_argument("--archive", default=None, help="archive root for consumed feeds")

    qp = sub.add_parser("query", help="run a registered query")
    qp.add_argument("name")
    qp.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    qp.add_argument("--limit", type=int, default=20)
    qp.add_argument("--explain", action="store_true")

    lp = sub.add_parser("list", help="list registered queries")
    lp.add_argument("--filter", default="")

    gp = sub.add_parser("ledger", help="verification-staleness histogram")
    gp.add_argument(
        "--glob",
        default="CORRECTNESS_r*.json",
        help="pattern for the driver correctness artifacts",
    )
    gp.add_argument(
        "--window",
        type=int,
        default=50,
        help="driver verify-window size (first N registered queries)",
    )
    return p


def _ledger(pattern: str, window: int) -> int:
    """No-Spark readout: fold every driver correctness artifact into a
    latest-round-per-query map and print the rotation picture."""
    import glob as _glob
    import json
    import re

    from emission_project_spark.plans import registry

    registry.load_all()
    latest: dict[str, int] = {}
    files = sorted(_glob.glob(pattern))
    if not files:
        print(f"no artifacts match {pattern!r}", file=sys.stderr)
        return 2
    for path in files:
        m = re.search(r"_r0*(\d+)", path)
        if not m:
            # An unparsable round would fold in at a bogus value and
            # skew the staleness sort (ADVICE r10) — skip loudly.
            print(f"skipping {path}: no _rN round in filename", file=sys.stderr)
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as fh:
                data = json.load(fh)
        except (OSError, json.JSONDecodeError) as e:
            print(f"skipping {path}: {e}", file=sys.stderr)
            continue
        for name in data:
            latest[name] = max(latest.get(name, rnd), rnd)

    names = list(registry.QUERIES)
    hist: dict[int, int] = {}
    for n in names:
        hist[latest.get(n, 0)] = hist.get(latest.get(n, 0), 0) + 1
    print(f"{len(names)} registered; latest verified round histogram:")
    for rnd in sorted(hist):
        label = f"r{rnd}" if rnd else "never"
        print(f"  {label:>6}: {hist[rnd]}")

    current = names[:window]
    print(f"\ncurrent window (first {window} registered):")
    cw_hist: dict[int, int] = {}
    for n in current:
        cw_hist[latest.get(n, 0)] = cw_hist.get(latest.get(n, 0), 0) + 1
    print(
        "  "
        + ", ".join(
            f"{(f'r{r}' if r else 'never')}×{c}"
            for r, c in sorted(cw_hist.items())
        )
    )

    stale = sorted(names, key=lambda n: (latest.get(n, 0), n))
    nxt = [n for n in stale if n not in set(current)][:window]
    print(f"\nstalest {len(nxt)} OUTSIDE the current window "
          "(lead the next rotation):")
    for n in nxt:
        r = latest.get(n, 0)
        print(f"  {(f'r{r}' if r else 'never'):>6}  {n}")
    return 0


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)

    from emission_project_spark.plans import registry

    registry.load_all()

    if args.command == "list":
        for name in registry.QUERIES:
            if args.filter in name:
                kind = "oracle" if name in registry.ORACLES else "rows-only"
                print(f"{name}  [{kind}]")
        return 0

    if args.command == "ledger":
        return _ledger(args.glob, args.window)

    from emission_project_spark.session import get_spark

    spark = get_spark("emission_project_spark.cli")
    spark.sparkContext.setLogLevel("ERROR")

    if args.command == "pipeline":
        from emission_project_spark.pipeline.emission import EmissionPipeline
        from emission_project_spark.sources.warehouse import Warehouse

        pipe = EmissionPipeline(spark, Warehouse(spark, args.warehouse))
        stats = pipe.run(args.incoming, archive_root=args.archive)
        for table, n in stats.inserted.items():
            print(f"{table}: +{n}")
        for table, n in stats.fk_violations.items():
            if n:
                print(f"{table}: {n} FK violations", file=sys.stderr)
        return 1 if any(stats.fk_violations.values()) else 0

    if args.command == "query":
        if args.name not in registry.QUERIES:
            print(f"unknown query: {args.name} (see `list`)", file=sys.stderr)
            return 2
        df = registry.QUERIES[args.name](spark, args.sf_dir)
        if args.explain:
            df.explain("formatted")
        else:
            df.show(args.limit, truncate=False)
        return 0

    return 2


if __name__ == "__main__":
    sys.exit(main())
