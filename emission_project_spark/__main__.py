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
    return p


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
