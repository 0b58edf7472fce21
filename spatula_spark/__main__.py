"""CLI entry points mirroring the reference's commands
(``/root/reference/src/spatula/cli.py``): ``scrape``, ``scout``,
``test`` — over a registry module instead of a class dotted-path.

    python -m spatula_spark scrape  my_module:build_registry SeedPage \\
        --store store.parquet -o out/
    python -m spatula_spark scout   my_module:build_registry SeedPage \\
        --store store.parquet -o scout.json
    python -m spatula_spark test    my_module:build_registry SomePage \\
        --store store.parquet [--no-pagination]

``my_module:build_registry`` must resolve to a zero-arg callable
returning a PageRegistry (the declarative replacement for the
reference's module scan, cli.py:143-154).
"""

from __future__ import annotations

import argparse
import importlib
import json
import sys


def _load_registry(spec: str):
    mod_name, _, fn_name = spec.partition(":")
    mod = importlib.import_module(mod_name)
    return getattr(mod, fn_name or "build_registry")()


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="spatula_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)
    for name in ("scrape", "scout", "test"):
        p = sub.add_parser(name)
        p.add_argument("registry", help="module[:factory] -> PageRegistry")
        p.add_argument("page_cls")
        p.add_argument("--store", required=True, help="page-store parquet")
        p.add_argument("--url", default=None, help="source override "
                       "(reference --source, cli.py:317-320)")
        p.add_argument("--data", default=None,
                       help="JSON input override (cli.py:221-257)")
        p.add_argument("-o", "--output", default=None)
        p.add_argument("--host-budget", type=int, default=None)
        p.add_argument("--cores", default=None)
        if name == "test":
            p.add_argument("--no-pagination", action="store_true")
    args = ap.parse_args(argv)

    from .plans.engine import CrawlConfig, CrawlEngine
    from .session import get_spark

    spark = get_spark(app_name=f"spatula_{args.cmd}", cores=args.cores)
    registry = _load_registry(args.registry)
    store = spark.read.parquet(args.store)
    eng = CrawlEngine(
        spark, registry, page_store=store,
        config=CrawlConfig(host_budget_per_wave=args.host_budget),
    )
    seed = {
        "page_cls": args.page_cls,
        "url": args.url,
        "input": json.loads(args.data) if args.data else None,
    }

    if args.cmd == "scrape":
        res = eng.crawl([seed])
        out = args.output or "_scrapes_out"
        if out.endswith(".parquet"):
            res.results.write.mode("overwrite").parquet(out)
        else:
            from .sources.sinks import to_json_files

            n = to_json_files(res.ordered(), out)
            print(f"success: wrote {n} objects to {out}")
        print(res.metrics.to_string())
    elif args.cmd == "scout":
        results = eng.scout([seed])
        out = args.output or "scout.json"
        from .sources.sinks import write_scout_json

        write_scout_json(results, out)
        print(f"success: wrote {len(results)} records to {out}")
    else:  # test
        from .utils import debug_run

        rows = debug_run(
            eng, args.page_cls, input=seed["input"], url=seed["url"],
            follow_pagination=not args.no_pagination,
        )
        for i, r in enumerate(rows, 1):
            print(f"{i}:", json.dumps(r))
        if args.no_pagination:
            print("pagination not followed (--no-pagination)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
