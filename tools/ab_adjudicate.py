"""Interleaved A/B adjudication harness for bench regressions.

The sandbox host's day-to-day variance (up to 3x on identical code)
makes sequential before/after timings meaningless; the repo's
protocol (established round 4) is an INTERLEAVED a-b-a-b comparison:
each measurement is a fresh subprocess (fresh JVM) running the named
driver queries once at the given sf, trees alternate so co-tenant
bursts land on both sides equally, and the verdict compares paired
medians.

Usage:
    python tools/ab_adjudicate.py --tree-a /path/to/treeA \
        --tree-b /path/to/treeB [--rounds 4] [--cpus 32] \
        [--sf-dir /root/testdata/sf0.1] \
        [--env-a K=V ...] [--env-b K=V ...] \
        query [query ...]

``--tree-a/--tree-b`` may be the same path with different ``--env-a/
--env-b`` to adjudicate an env-toggled code path. Emits one JSON line
with per-query times for every run plus median ratios (B/A; < 1
means B faster).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile

_CHILD = r"""
import json, os, sys, time
sf_dir, cpus, names = sys.argv[1], sys.argv[2], sys.argv[3:]
sys.path.insert(0, os.environ["AB_TREE"])
from kafka_jdbc_sink_connector_spark.session import build_session
spark = build_session(
    app_name="ab", cores=cpus, shuffle_partitions=int(cpus) * 2,
    extra_conf={
        "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEM", "16g"),
        "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
        "spark.local.dir": os.environ["AB_LOCAL_DIR"],
        "spark.ui.showConsoleProgress": "false",
    },
)
import __spark_entry__ as entry
qs = entry.queries()
out = {}
for name in names:
    t0 = time.monotonic()
    qs[name](spark, sf_dir).count()
    out[name] = round(time.monotonic() - t0, 3)
print("AB_RESULT " + json.dumps(out))
spark.stop()
"""


def _run_once(tree: str, sf_dir: str, cpus: str, names: list[str],
              extra_env: dict[str, str], local_dir: str) -> dict[str, float]:
    env = dict(os.environ)
    env.update(extra_env)
    env["AB_TREE"] = tree
    env["AB_LOCAL_DIR"] = local_dir
    env["PYTHONPATH"] = tree
    p = subprocess.run(
        [sys.executable, "-c", _CHILD, sf_dir, cpus, *names],
        capture_output=True, text=True, env=env, cwd=tree,
    )
    for line in p.stdout.splitlines():
        if line.startswith("AB_RESULT "):
            return json.loads(line[len("AB_RESULT "):])
    raise RuntimeError(
        f"child in {tree} produced no result:\n{p.stdout[-2000:]}\n"
        f"{p.stderr[-2000:]}"
    )


def _parse_env(pairs: list[str]) -> dict[str, str]:
    return dict(p.split("=", 1) for p in pairs)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tree-a", required=True)
    ap.add_argument("--tree-b", required=True)
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--cpus", default="32")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--env-a", action="append", default=[])
    ap.add_argument("--env-b", action="append", default=[])
    ap.add_argument(
        "--alternate", action="store_true",
        help="run b before a on odd rounds, cancelling any "
             "first-vs-second position effect (cache warmth, load "
             "drift) within each pair",
    )
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    local = tempfile.mkdtemp(
        prefix="ab-local-",
        dir="/dev/shm" if os.path.isdir("/dev/shm") else None,
    )
    runs: list[dict] = []
    env_a, env_b = _parse_env(args.env_a), _parse_env(args.env_b)
    for i in range(args.rounds):
        order = (("a", args.tree_a, env_a), ("b", args.tree_b, env_b))
        if args.alternate and i % 2 == 1:
            order = order[::-1]
        for side, tree, env in order:
            res = _run_once(tree, args.sf_dir, args.cpus, args.queries,
                            env, local)
            runs.append({"round": i, "side": side, "times": res})
            print(f"  round {i} side {side}: "
                  + " ".join(f"{k}={v}" for k, v in res.items()),
                  file=sys.stderr, flush=True)
    verdict = {}
    for q in args.queries:
        a = [r["times"][q] for r in runs if r["side"] == "a"]
        b = [r["times"][q] for r in runs if r["side"] == "b"]
        ma, mb = statistics.median(a), statistics.median(b)
        verdict[q] = {
            "median_a": round(ma, 3),
            "median_b": round(mb, 3),
            "ratio_b_over_a": round(mb / ma, 3) if ma else None,
            "a": a,
            "b": b,
        }
    print(json.dumps({
        "sf_dir": args.sf_dir, "cpus": args.cpus,
        "rounds": args.rounds, "verdict": verdict,
    }))


if __name__ == "__main__":
    main()
