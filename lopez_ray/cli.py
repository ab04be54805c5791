"""CLI mirroring the reference's subcommands (lib-lopez/src/lib.rs:54-289,
cli.rs:97-156): run / validate / test / page-rank / rm.

Usage:
  python -m lopez_ray.cli validate <config.lcd>
  python -m lopez_ray.cli run <config.lcd> <wave_name> [--out DIR]
      [--fixture-dir DIR] [--tier t1|t2|bench] [--batch-size N]
      [--shards N] [--fetchers N] [--max-quota N] [--resume] [--json]
  python -m lopez_ray.cli test <config.lcd> <url> [--fixture-dir DIR]
  python -m lopez_ray.cli page-rank <wave_dir>
  python -m lopez_ray.cli rm <wave_dir>

Owns its Ray session (the driver contract keeps __ray_entry__ free of
ray.init; scripts guard with is_initialized).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys


def _ray_init():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )


def _fixture(args):
    from .fixtures.gen import generate

    fixture_dir = args.fixture_dir or os.path.join("/tmp/lopez_ray_fixtures", args.tier)
    return generate(fixture_dir, tier=args.tier)


def cmd_validate(args) -> int:
    from .dsl.directives import Directives

    try:
        d = Directives.load(args.config, args.import_path)
    except Exception as e:
        print(f"invalid: {e}", file=sys.stderr)
        return 1
    types = d.rule_types()
    print(f"ok: {len(d.modules)} module(s), {len(types)} rule(s)")
    for name, t in sorted(types.items()):
        print(f"  {name}: {t}")
    return 0


def cmd_run(args) -> int:
    _ray_init()
    from .crawler.waves import CrawlJob

    paths = _fixture(args)
    with open(args.config, encoding="utf-8") as f:
        source = f.read()
    job = CrawlJob(
        source,
        web_path=paths["web"],
        corpus_path=paths["corpus"],
        robots_path=paths["robots"],
        out_dir=args.out,
        wave_name=args.wave_name,
        n_shards=args.shards,
        n_fetchers=args.fetchers,
        batch_size=args.batch_size,
        max_quota=args.max_quota,
    )
    summary = job.run(resume=args.resume)
    print(json.dumps(summary, indent=None if args.json else 1))
    return 0


def cmd_test(args) -> int:
    """Single-URL conformance report (lopez test; worker/mod.rs:387-417)."""
    _ray_init()
    import pyarrow.parquet as pq
    import ray

    from .crawler.fetch import FetchStage
    from .crawler.analyze import AnalyzeStage
    from .dsl.directives import Directives
    import pyarrow as pa

    paths = _fixture(args)
    with open(args.config, encoding="utf-8") as f:
        source = f.read()
    d = Directives.from_source(source)
    boundaries = d.boundaries()
    actual_url = boundaries.clean_query_params(args.url)
    report: dict = {"actual_url": actual_url}
    # Downloader routing (reference crawler/downloader/web_driver.rs:9-105
    # + SelectiveDownloader, directives/mod.rs:164-177): URLs matching a
    # `use webdriver on "re"` pattern take the W3C WebDriver protocol
    # path (crawler/webdriver.py) — the real wire client over the
    # fixture browser in this sandbox, or a chromedriver endpoint via
    # HttpTransport when LOPEZ_WEBDRIVER_URL points at one.
    from .crawler.webdriver import WebDriverSelector

    wd = WebDriverSelector(d.webdriver_patterns())
    report["downloader"] = (
        "webdriver" if wd.use_webdriver(actual_url) else "simple"
    )
    if not boundaries.is_allowed(actual_url):
        report["report"] = "DisallowedByDirectives"
        _emit_report(report, args)
        return 0
    web = pq.read_table(paths["web"])
    robots = {
        r["host"]: r["robots_txt"]
        for r in pq.read_table(paths["robots"]).to_pylist()
        if r["robots_txt"] is not None
    }
    params = d.parameters()
    stage = FetchStage(
        web,
        robots,
        paths["corpus"],
        max_hits_per_sec=params.max_hits_per_sec,
        request_timeout=params.request_timeout,
        max_body_size=params.max_body_size,
        webdriver_patterns=d.webdriver_patterns(),
    )
    batch = pa.table(
        {
            "url": pa.array([actual_url], pa.large_utf8()),
            "page_id": pa.array([0], pa.int64()),
            "depth": pa.array([0], pa.int32()),
            "seq": pa.array([0], pa.int64()),
        }
    )
    fetched = stage(batch)
    if fetched["outcome"][0].as_py() == "robots_denied":
        report["report"] = "DisallowedByOrigin"
        _emit_report(report, args)
        return 0
    analyzed = AnalyzeStage(source)(fetched)
    row = analyzed.to_pylist()[0]
    report["report"] = {
        "outcome": row["outcome"],
        "status_code": row["status_code"],
        "links": list(zip(row["link_reasons"], row["link_urls"])),
        "analyses": {
            k.removeprefix("rule."): v for k, v in row.items() if k.startswith("rule.")
        },
    }
    _emit_report(report, args)
    return 0


def _emit_report(report: dict, args) -> None:
    """Console report by default (reference pretty_print.rs parity);
    --json for machine output."""
    if getattr(args, "json", False):
        print(json.dumps(report, indent=1))
    else:
        from .pretty_report import pretty_print_report

        pretty_print_report(report)


def cmd_page_rank(args) -> int:
    _ray_init()
    import numpy as np
    import pyarrow.parquet as pq
    import pyarrow as pa

    from .crawler.pagerank import harvest_edges, power_iteration

    # distributed edge harvest (vectorized explode + broadcast closed
    # filter); only the final edge list lands on the driver for the
    # reference-parity numpy engine
    edges_df = harvest_edges(args.wave_dir).to_pandas()
    edges = np.column_stack(
        [edges_df["from_id"].to_numpy(), edges_df["to_id"].to_numpy()]
    ).astype(np.int64)
    nodes, ranks = power_iteration(edges)
    out = pa.table({"page_id": pa.array(nodes, pa.int64()), "rank": pa.array(ranks, pa.float64())})
    dest = os.path.join(args.wave_dir, "page_rank.parquet")
    pq.write_table(out, dest)
    print(json.dumps({"pages": len(nodes), "edges": len(edges), "out": dest}))
    return 0


def cmd_rm(args) -> int:
    if os.path.isdir(args.wave_dir):
        shutil.rmtree(args.wave_dir)
        print(f"removed {args.wave_dir}")
        return 0
    print(f"no such wave dir {args.wave_dir}", file=sys.stderr)
    return 1


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="lopez-ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    v = sub.add_parser("validate")
    v.add_argument("config")
    v.add_argument("--import-path", default=None)
    v.set_defaults(fn=cmd_validate)

    r = sub.add_parser("run")
    r.add_argument("config")
    r.add_argument("wave_name")
    r.add_argument("--out", default="/tmp/lopez_ray_out")
    r.add_argument("--fixture-dir", default=None)
    r.add_argument("--tier", default="t2")
    r.add_argument("--batch-size", type=int, default=1024)
    r.add_argument("--shards", type=int, default=4)
    r.add_argument("--fetchers", type=int, default=4)
    r.add_argument("--max-quota", type=int, default=None)
    r.add_argument("--resume", action="store_true")
    r.add_argument("--json", action="store_true")
    r.set_defaults(fn=cmd_run)

    t = sub.add_parser("test")
    t.add_argument("config")
    t.add_argument("url")
    t.add_argument("--fixture-dir", default=None)
    t.add_argument("--tier", default="t2")
    t.add_argument("--json", action="store_true", help="machine output instead of the console report")
    t.set_defaults(fn=cmd_test)

    pr = sub.add_parser("page-rank")
    pr.add_argument("wave_dir")
    pr.set_defaults(fn=cmd_page_rank)

    rm = sub.add_parser("rm")
    rm.add_argument("wave_dir")
    rm.set_defaults(fn=cmd_rm)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
