"""Extra measurement harness for the optimization rounds (bench.py is
FROZEN for driver measurement; this file carries the builder-side
isolation runs the optimization guide §1 asks for).

Same methodology as bench.py's headline phase (untimed warmup pass, then
N interleaved timed rounds, best-of per query) but:
  * query subset selectable (--queries a,b,c);
  * optional noop-sink isolation (--noop): times
    df.write.format("noop") instead of .collect(), so the timed region
    is the computation, not result transfer to the driver;
  * optional plan capture (--plans DIR): writes <query>.txt with
    .explain("formatted") output;
  * per-query job descriptions so the UI/eventlog is readable.

Prints one JSON line: {"queries": {...}, "trials": {...}, "sf_dir": ...}
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "pricing_summary", "cust_order_join", "window_rank",
    "window_prefix_sum", "distinct_agg", "token_stats", "quality_score",
    "minhash_sketch", "simhash", "near_dup_pairs",
    "embed_topk", "embed_near_dups",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default=None,
                    help="comma-separated subset (default: headline 12)")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--noop", action="store_true",
                    help="time a noop-sink write instead of collect()")
    ap.add_argument("--plans", default=None,
                    help="directory to write explain('formatted') files")
    args = ap.parse_args()

    names = args.queries.split(",") if args.queries else HEADLINE

    from document_ai_spark.session import get_spark
    import __spark_entry__ as E

    spark = get_spark("bench-extra", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()

    def run(name: str) -> None:
        df = qs[name](spark, SF_DIR)
        if args.noop:
            df.write.format("noop").mode("overwrite").save()
        else:
            df.collect()

    if args.plans:
        os.makedirs(args.plans, exist_ok=True)
        for name in names:
            df = qs[name](spark, SF_DIR)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted"))
            with open(os.path.join(args.plans, f"{name}.txt"), "w") as f:
                f.write(plan)

    # Warmup (untimed): session/codegen/footer costs land here.
    for name in names:
        spark.sparkContext.setJobDescription(f"warmup:{name}")
        run(name)
    trials = {name: [] for name in names}
    for r in range(args.rounds):
        for name in names:
            spark.sparkContext.setJobDescription(f"r{r}:{name}")
            t0 = time.monotonic()
            run(name)
            trials[name].append(round(time.monotonic() - t0, 3))
    out = {name: min(ts) for name, ts in trials.items()}
    print(json.dumps({
        "sf_dir": SF_DIR, "noop": args.noop,
        "total": round(sum(out.values()), 3),
        "queries": out, "trials": trials,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
