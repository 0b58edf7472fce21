"""CLI entry points mirroring the reference's commands
(``/root/reference/src/spatula/cli.py``): ``scrape``, ``scout``,
``test``, ``shell`` — over a registry module instead of a class
dotted-path.

    python -m spatula_spark scrape  my_module:build_registry SeedPage \\
        --store store.parquet -o out/
    python -m spatula_spark scout   my_module:build_registry SeedPage \\
        --store store.parquet -o scout.json
    python -m spatula_spark test    my_module:build_registry SomePage \\
        --store store.parquet -d key=value [--interactive] [--no-pagination]
    python -m spatula_spark shell   http://example.com/page --store store.parquet

``my_module:build_registry`` must resolve to a zero-arg callable
returning a PageRegistry (the declarative replacement for the
reference's module scan, cli.py:143-154).

Scraper configuration mirrors the reference's scrapelib knobs
(cli.py:27-93): ``--user-agent --rpm --timeout --verify --retries
--retry-wait --header --fastmode``. With ``--store`` (synthetic
page-store join) only ``--rpm`` applies (mapped to the per-host
per-wave budget — the distributed generalization of the reference's
global token bucket); with ``--live`` every knob feeds the real-HTTP
``mapInPandas`` fetcher, and ``--fastmode`` enables the per-URL
response cache (the reference's SQLiteCache, cli.py:91-93).
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


def _add_scraper_params(p: argparse.ArgumentParser) -> None:
    """Reference ``scraper_params`` flag set (cli.py:27-93)."""
    p.add_argument("-ua", "--user-agent", default="spatula_spark 0.1",
                   help="override default user-agent")
    p.add_argument("--rpm", type=int, default=60,
                   help="requests per minute -> per-host per-wave budget")
    p.add_argument("--timeout", type=float, default=5.0,
                   help="HTTP request timeout in seconds")
    p.add_argument("--verify", action=argparse.BooleanOptionalAction,
                   default=True, help="control verification of SSL certs")
    p.add_argument("--retries", type=int, default=0,
                   help="retries on HTTP transport error")
    p.add_argument("--retry-wait", type=float, default=10.0,
                   help="seconds to wait between HTTP retries")
    p.add_argument("-H", "--header", action="append", default=[],
                   help="add a header to all requests ('Name: value')")
    p.add_argument("--fastmode", action="store_true",
                   help="use a response cache to avoid repeat requests")
    p.add_argument("-v", "--verbosity", type=int, default=-1,
                   help="override default verbosity (0-3)")
    p.add_argument("--store", default=None, help="page-store parquet")
    p.add_argument("--live", action="store_true",
                   help="fetch over real HTTP instead of a page store")
    p.add_argument("--cores", default=None)


def _parse_headers(pairs: list[str]) -> dict:
    out = {}
    for h in pairs:
        k, _, v = h.partition(":")
        out[k.strip()] = v.strip()
    return out


def _make_engine(args, registry=None):
    from .plans.engine import CrawlConfig, CrawlEngine
    from .session import get_spark

    spark = get_spark(app_name=f"spatula_{args.cmd}", cores=args.cores)
    fetch_fn = store = None
    if args.live:
        from .sources.http_fetch import make_http_fetcher

        fetch_fn = make_http_fetcher(
            timeout=args.timeout,
            user_agent=args.user_agent,
            headers=_parse_headers(args.header),
            verify=args.verify,
            retries=args.retries,
            retry_wait=args.retry_wait,
            cache_dir="spatula-cache" if args.fastmode else None,
        )
    elif args.store:
        store = spark.read.parquet(args.store)
    else:
        raise SystemExit("one of --store or --live is required")
    budget = getattr(args, "host_budget", None)
    if budget is None and args.rpm:
        # the reference's global rpm token bucket, generalized per host:
        # one wave's budget per host = rpm (a wave ~ a scheduling round)
        budget = args.rpm
    eng = CrawlEngine(
        spark,
        registry if registry is not None else _load_registry(args.registry),
        page_store=store,
        fetch_fn=fetch_fn,
        config=CrawlConfig(
            host_budget_per_wave=budget,
            verbose=args.verbosity >= 2,
        ),
    )
    return spark, eng


def build_shell_locals(args) -> dict:
    """The ``spatula shell`` namespace (reference cli.py:192-216): fetch
    one URL, bind ``url``/``resp``/``root`` plus the selector classes.
    Factored out so tests can assert the namespace without a console."""
    from .operators.parsers import parse_html
    from .operators.selectors import CSS, SimilarLink, XPath

    url = args.url
    if args.live:
        import urllib.request

        req = urllib.request.Request(
            url, method=args.verb,
            headers={"User-Agent": args.user_agent,
                     **_parse_headers(args.header)},
        )
        with urllib.request.urlopen(req, timeout=args.timeout) as r:
            payload = r.read()
            status = r.status
    else:
        from pyspark.sql import functions as F

        from .session import get_spark
        from .urls import canonicalize_url, url_hash

        spark = get_spark(app_name="spatula_shell", cores=args.cores)
        store = spark.read.parquet(args.store)
        rows = store.filter(
            F.col("url_hash")
            == url_hash(canonicalize_url(F.lit(url)))
        ).take(1)
        if not rows:
            raise SystemExit(f"{url} not found in page store")
        payload = bytes(rows[0]["payload"] or b"")
        status = int(rows[0]["status"])
    root = parse_html(payload, base_url=url)
    return {
        "url": url,
        "resp": {"status": status, "content": payload},
        "root": root,
        "CSS": CSS,
        "XPath": XPath,
        "SimilarLink": SimilarLink,
    }


def _prepare_scrape_dir(output: str | None, rmdir: bool) -> str | None:
    """Reference output-dir contract (cli.py:395-418): without ``-o``
    the scrape goes to an auto-numbered ``_scrapes/DATE/NNN`` (the
    mkdir itself is the collision check, so concurrent scrapes race
    safely); with ``-o`` an existing non-empty directory is refused
    unless ``--rmdir`` clears it first. Returns the ready directory,
    or None after printing the refusal (caller exits 1)."""
    import datetime
    import shutil
    from pathlib import Path

    if not output:
        dirn = 1
        today = datetime.date.today().strftime("%Y-%m-%d")
        while True:
            path = Path(f"_scrapes/{today}/{dirn:03d}")
            try:
                path.mkdir(parents=True)
                return str(path)
            except FileExistsError:
                dirn += 1
    path = Path(output)
    try:
        path.mkdir(parents=True)
    except FileExistsError:
        if any(path.iterdir()):
            if rmdir:
                print(f"{output} exists and was cleared")
                shutil.rmtree(output)
                path.mkdir(parents=True)
            else:
                print(f"{output} exists and is not empty")
                return None
    return str(path)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="spatula_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)
    for name in ("scrape", "scout", "test"):
        p = sub.add_parser(name)
        p.add_argument("registry", help="module[:factory] -> PageRegistry")
        p.add_argument("page_cls")
        p.add_argument("-s", "--source", "--url", dest="url", default=None,
                       help="provide (or override) source URL "
                       "(reference cli.py:270,317-320)")
        p.add_argument("-o", "--output", default=None)
        p.add_argument("--host-budget", type=int, default=None)
        _add_scraper_params(p)
        if name == "test":
            p.add_argument("-d", "--data", action="append", default=[],
                           help="input data as name=value pairs (or one "
                           "JSON object)")
            p.add_argument("--interactive",
                           action=argparse.BooleanOptionalAction,
                           default=False,
                           help="prompt for missing input fields")
            p.add_argument("--pagination",
                           action=argparse.BooleanOptionalAction, default=True)
        if name == "scrape":
            p.add_argument("--dump", default=None,
                           help="module:fn custom dump function "
                           "(reference cli.py:382)")
            p.add_argument("--rmdir", action="store_true",
                           help="clear output directory if it exists "
                           "(reference cli.py:372-378)")
            p.add_argument("--warc-dir", default=None,
                           help="also archive every page this scrape "
                           "fetched as seekable .warc.gz shards "
                           "(sources/warc.py; no reference equivalent "
                           "-- the 100-TB page-store layer)")
    shell_p = sub.add_parser("shell")
    shell_p.add_argument("url")
    shell_p.add_argument("-X", "--verb", default="GET",
                         help="HTTP verb such as POST (live mode)")
    _add_scraper_params(shell_p)
    args = ap.parse_args(argv)

    if args.cmd == "shell":
        import code

        ns = build_shell_locals(args)
        print("spatula_spark shell")
        print("available selectors: CSS, SimilarLink, XPath")
        print("local variables\n---------------")
        print(f"url: {ns['url']}")
        print(f"resp: status={ns['resp']['status']}, "
              f"{len(ns['resp']['content'])} bytes")
        print(f"root: parsed element <{ns['root'].tag}>")
        code.interact(banner="", local=ns)
        return 0

    spark, eng = _make_engine(args)

    if args.cmd == "test":
        from .utils import synthesize_input

        if len(args.data) == 1 and args.data[0].lstrip().startswith("{"):
            inp = json.loads(args.data[0])
        else:
            inp = synthesize_input(
                eng.registry[args.page_cls], args.data, args.interactive,
            ) or None
    else:
        inp = None
    seed = {"page_cls": args.page_cls, "url": args.url, "input": inp}

    if args.cmd == "scrape":
        out = args.output
        if out and out.endswith(".parquet"):
            res = eng.crawl([seed])
            res.results.write.mode("overwrite").parquet(out)
        else:
            # directory readiness BEFORE the scrape, like the reference
            out = _prepare_scrape_dir(out, args.rmdir)
            if out is None:
                return 1
            res = eng.crawl([seed])
            from .sources.sinks import to_json_files

            dump_fn = None
            if args.dump:
                mod, _, fn = args.dump.partition(":")
                dump_fn = getattr(importlib.import_module(mod), fn)
            n = to_json_files(res.ordered(), out, dump=dump_fn)
            print(f"success: wrote {n} objects to {out}")
        if args.warc_dir and eng.page_store is not None:
            from pyspark.sql import functions as F

            from .sources.warc import archive_page_store

            # engine's internal projection carries the canonical URL
            # as store_url (engine.py page_store select)
            fetched = eng.page_store.join(
                res.seen.select("url_hash").distinct(),
                "url_hash", "left_semi",
            ).withColumn("url", F.col("store_url"))
            n_arch = archive_page_store(fetched, args.warc_dir).count()
            print(f"archived {n_arch} records to {args.warc_dir}")
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
            follow_pagination=args.pagination,
        )
        for i, r in enumerate(rows, 1):
            print(f"{i}:", json.dumps(r))
        if not args.pagination:
            print("pagination not followed (--no-pagination)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
