"""Extra benchmarks for the optimization rounds (bench.py is FROZEN).

Per-query isolation per the optimization guide §1: time a single
declared query with the noop sink (computes every column, discards the
write) or with the frozen bench's ``.count()`` methodology, capture the
``explain("formatted")`` plan, and repeat N times in one warm session.

Usage:
  python bench_extra.py --query NAME [--sf DIR] [--mode noop|count]
                        [--repeat N] [--explain OUT.txt]
  python bench_extra.py --all [--sf DIR] [--mode count] [--repeat N]

Prints one JSON line: {"query": ..., "samples": [...], "min": ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def _run(df, mode: str):
    if mode == "noop":
        df.write.format("noop").mode("overwrite").save()
        return None
    return df.count()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--query")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--mode", default="count", choices=["count", "noop"])
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--explain")
    ap.add_argument("--cpus", type=int, default=int(
        os.environ.get("SPARK_GRAFT_CPUS") or 32))
    args = ap.parse_args()

    from m3spark.session import get_spark

    import __spark_entry__ as entry

    spark = get_spark("bench-extra", cores=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    names = list(qs) if args.all else args.query.split(",")
    out = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        samples = []
        result = None
        for _ in range(args.repeat):
            t0 = time.monotonic()
            result = _run(qs[name](spark, args.sf), args.mode)
            samples.append(round(time.monotonic() - t0, 3))
        out[name] = {"samples": samples,
                     "min": min(samples) if samples else None,
                     "count": result}
    if args.explain and args.query:
        import contextlib
        import io

        df = qs[args.query](spark, args.sf)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(args.explain, "w") as f:
            f.write(buf.getvalue())
    print(json.dumps({"sf": args.sf, "mode": args.mode,
                      "cpus": args.cpus, "results": out}))
    spark.stop()


if __name__ == "__main__":
    main()
