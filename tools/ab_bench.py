"""Pinned-window interleaved A/B of specific queries() entries between
the CURRENT tree and a git ref (the commit-98436cc methodology):
each side runs in a FRESH subprocess JVM, sides alternate A,B,B,A per
round so window drift cannot land on one side, 1 warmup + N timed runs
per invocation, sf0.1 input.

    python tools/ab_bench.py <ref> <query> [<query> ...]

Prints one JSON line per query: median seconds per side + ratio.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import tempfile

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TIMED = int(os.environ.get("M3SPARK_AB_TIMED", "5"))
ROUNDS = int(os.environ.get("M3SPARK_AB_ROUNDS", "2"))

_CHILD = r"""
import json, sys, time, statistics
tree, qname, sf, timed = sys.argv[1], sys.argv[2], sys.argv[3], \
    int(sys.argv[4])
sys.path.insert(0, tree)   # the side's OWN entry + m3spark package
import __spark_entry__ as entry
from m3spark.session import get_spark
spark = get_spark("ab", cores=16)
spark.sparkContext.setLogLevel("ERROR")
q = entry.queries()[qname]
q(spark, sf).count()  # warmup
secs = []
for _ in range(timed):
    t0 = time.monotonic(); q(spark, sf).count()
    secs.append(time.monotonic() - t0)
print(json.dumps({"median": statistics.median(secs),
                  "runs": [round(s, 3) for s in secs]}))
spark.stop()
"""


def _run_side(tree: str, query: str) -> float:
    with tempfile.NamedTemporaryFile("w", suffix=".py",
                                     delete=False) as f:
        f.write(_CHILD)
        script = f.name
    try:
        out = subprocess.run(
            [sys.executable, script, tree, query, SF, str(TIMED)],
            capture_output=True, text=True, check=True, cwd=tree)
        line = [ln for ln in out.stdout.splitlines()
                if ln.startswith("{")][-1]
        return json.loads(line)["median"]
    finally:
        os.unlink(script)


def main():
    ref = sys.argv[1]
    queries = sys.argv[2:]
    wt = tempfile.mkdtemp(prefix="ab_ref_")
    subprocess.run(["git", "worktree", "add", "--detach", wt, ref],
                   cwd="/root/repo", check=True, capture_output=True)
    try:
        for q in queries:
            a_times, b_times = [], []
            for r in range(ROUNDS):
                # ABBA ordering: window drift cancels across the round
                order = [("ref", wt), ("cur", "/root/repo")] if r % 2 == 0 \
                    else [("cur", "/root/repo"), ("ref", wt)]
                for side, tree in order:
                    sec = _run_side(tree, q)
                    (a_times if side == "ref" else b_times).append(sec)
            med_ref = statistics.median(a_times)
            med_cur = statistics.median(b_times)
            print(json.dumps({
                "query": q, "ref": ref,
                "ref_sec": round(med_ref, 3),
                "cur_sec": round(med_cur, 3),
                "ref_runs": [round(x, 3) for x in a_times],
                "cur_runs": [round(x, 3) for x in b_times],
                "cur_over_ref": round(med_cur / med_ref, 3),
            }), flush=True)
    finally:
        subprocess.run(["git", "worktree", "remove", "--force", wt],
                       cwd="/root/repo", check=True, capture_output=True)


if __name__ == "__main__":
    main()
