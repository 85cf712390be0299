"""Extra benchmarks for the optimization round (bench.py is frozen).

Times individual headline queries with the noop sink (guide §1.4), with
job descriptions (§1.5), optionally capturing .explain("formatted") for
each query into a plans directory. Prints one JSON line per run.

Usage:
  python bench_extra.py --queries simhash_near_dups,repetition_stats \
      --sf-dir /root/testdata/sf1.0 --rounds 2 --plans-dir plans/r06/tmp
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from bench import HEADLINE  # noqa: E402  (frozen list of headline legs)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--queries", default="all")
    ap.add_argument("--rounds", type=int, default=1)
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--plans-suffix", default="before")
    args = ap.parse_args()

    import __spark_entry__ as entrymod

    from gobulk_spark.operators.dedup import release_pins
    from gobulk_spark.session import get_spark

    spark = get_spark(f"local[{args.cpus}]", app_name="gobulk-bench-extra")
    qs = dict(entrymod.queries())
    qs["embedding_pq_ann"] = entrymod.q_embedding_pq_ann
    qs["asof_join_purchase_view"] = entrymod.q_asof_join_purchase_view
    qs["asof_join_salted_view"] = entrymod.q_asof_join_salted_view
    qs["hash_split"] = entrymod.q_hash_split
    qs["stratified_sample"] = entrymod.q_stratified_sample
    qs["repetition_stats"] = entrymod.q_repetition_stats
    qs["segment_dedup"] = entrymod.q_segment_dedup

    names = list(HEADLINE) if args.queries == "all" else args.queries.split(",")

    # same untimed warm-up as bench.py so timings are steady-state
    entrymod._ship_package(spark)

    def _warm(batches):
        import pandas as pd

        from gobulk_spark.models import langid, perplexity

        langid.predict(pd.Series(["warm up the models"]))
        perplexity.score(pd.Series(["warm up the models"]))
        yield from batches

    ncpu = int(args.cpus)
    spark.range(ncpu * 8, numPartitions=ncpu * 2).mapInPandas(
        _warm, schema="id long"
    ).write.mode("overwrite").format("noop").save()
    qs["language_distribution"](spark, args.sf_dir).write.mode("overwrite").format(
        "noop"
    ).save()

    if args.plans_dir:
        os.makedirs(args.plans_dir, exist_ok=True)
        for name in names:
            df = qs[name](spark, args.sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(
                os.path.join(args.plans_dir, f"{name}_{args.plans_suffix}.txt"), "w"
            ) as f:
                f.write(buf.getvalue())
            release_pins()

    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(args.rounds):
        for name in names:
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            qs[name](spark, args.sf_dir).write.mode("overwrite").format("noop").save()
            samples[name].append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
            release_pins()
    spark.stop()
    mins = {n: min(s) for n, s in samples.items()}
    print(
        json.dumps(
            {
                "sf_dir": args.sf_dir,
                "cpus": args.cpus,
                "total_min_sec": round(sum(mins.values()), 3),
                "queries_min": mins,
                "samples": samples,
            }
        )
    )


if __name__ == "__main__":
    main()
