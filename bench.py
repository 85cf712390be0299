"""Benchmark harness.

Prints ONE JSON line:
  {"metric": "total_headline_query_sec", "value": <sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>,
   "pipeline": {"rows": N, "images_per_sec_local8": ..,
                "images_per_sec_local32": .., "scaling_efficiency": ..}}

Two parts:
1. headline operator queries from __spark_entry__ at $SPARK_GRAFT_SF_DIR
   (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]; results
   sunk to the noop format so we time execution, not driver transfer.
2. the full quality-filter pipeline over a cached synthetic image+caption
   corpus at local[8] and local[32] (the sandbox stand-in for N vs 4N
   executors). Throughput = corpus rows / end-to-end pipeline wall
   (fresh out dir, resume disabled), reported at both parallelism levels
   with scaling efficiency (T8/T32)/4.

Run `python bench.py` for everything, or with --pipeline-master local[N]
to run only the pipeline leg in-process (used by the subprocess fan-out
so each parallelism level gets a fresh JVM).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

BENCH_ROWS = int(os.environ.get("BENCH_PIPELINE_ROWS", "120000"))
CORPUS_DIR = os.path.join(REPO, ".bench_data", f"pairs{BENCH_ROWS}")

HEADLINE = (
    "flagship_quality_filter",
    "quality_rule_filter",
    "token_stats",
    "max_token_freq",
    "fingerprint_dedup",
    "minhash_lsh_candidates",
    "ngram_jaccard_pairs",
    "simhash_near_dups",
    "embedding_topk",
    "metrics_rollup",
    "tpch_q1_pricing",
    "marker_anti_join",
)


def ensure_bench_corpus() -> str:
    from gobulk_spark.corpus import ensure_corpus

    return ensure_corpus(CORPUS_DIR, BENCH_ROWS, seed=42)


def _warm_page_cache(path: str) -> None:
    """Pull the source file into the OS page cache before a scaling leg.

    The sandbox has ONE virtual disk (~150 MB/s); a real cluster reads
    from distributed storage whose aggregate bandwidth grows with the
    executor count. Pre-warming removes the single-disk artifact so the
    legs measure the resource that actually scales (CPU); the cold-read
    cost is reported once in the JSON for transparency.
    """
    with open(path, "rb") as f:
        while f.read(1 << 26):
            pass


def time_queries(sf_dir: str, cpus: str) -> dict[str, float]:
    import __spark_entry__ as entrymod

    from gobulk_spark.session import get_spark

    spark = get_spark(f"local[{cpus}]", app_name="gobulk-bench")
    qs = entrymod.queries()
    out: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        out[name] = round(time.time() - t0, 3)
    spark.stop()
    return out


def run_pipeline_leg(master: str, source_path: str) -> dict:
    """One end-to-end pipeline run + one compute-only parse run.

    Two throughputs per parallelism level:
    - end_to_end: full checkpointed pipeline (includes the sandbox's
      fixed single-disk/single-JVM costs: phase commits, parquet IO,
      job scheduling — costs that are per-cluster, not per-executor, on
      a real deployment);
    - parse_compute: the vectorized decode+model stage alone (scan ->
      mapInPandas -> noop sink), the part whose cost grows with data and
      must scale with cores.
    """
    from pyspark.sql import functions as F

    from gobulk_spark.config import PipelineConfig
    from gobulk_spark.pipeline import run_pipeline
    from gobulk_spark.session import get_spark
    from gobulk_spark.sources import scan as src_scan
    from gobulk_spark.stages import PARSE_OUTPUT_SCHEMA, make_parse_stage

    tag = master.replace("[", "_").replace("]", "")
    out_dir = f"/tmp/gobulk_bench_out/{tag}"
    shutil.rmtree(out_dir, ignore_errors=True)
    spark = get_spark(
        master,
        app_name=f"gobulk-pipeline-{tag}",
        # split the single bench parquet finely enough to feed all cores
        # without a shuffle (a 100TB table has plenty of natural splits)
        extra_conf={"spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024)},
    )

    # compute-only legs: cold (includes per-worker python import + model
    # fit — a per-executor one-time cost on a real cluster) then warm
    # (steady-state throughput, the number that scales with data volume)
    n_rows = spark.read.parquet(source_path).count()

    def compute_leg() -> float:
        t0 = time.time()
        (
            src_scan.read_source(spark, source_path)
            .mapInPandas(make_parse_stage(False), schema=PARSE_OUTPUT_SCHEMA)
            .write.mode("overwrite")
            .format("noop")
            .save()
        )
        return time.time() - t0

    cold_wall = compute_leg()
    compute_wall = compute_leg()

    cfg = PipelineConfig(
        source_path=source_path, out_dir=out_dir, run_id="bench", resume=False
    )
    t0 = time.time()
    summary = run_pipeline(spark, cfg)
    wall = time.time() - t0
    rows = summary["phases"]["store"]["rows_in"]
    spark.stop()
    return {
        "master": master,
        "rows": rows,
        "wall_s": round(wall, 2),
        "images_per_sec": round(rows / wall, 1),
        "compute_wall_s": round(compute_wall, 2),
        "compute_cold_wall_s": round(cold_wall, 2),
        "compute_images_per_sec": round(n_rows / compute_wall, 1),
        "phase_wall_s": {
            p: round(v.get("wall_s", 0.0), 2) for p, v in summary["phases"].items()
        },
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pipeline-master", default=None)
    args = ap.parse_args()

    source = ensure_bench_corpus()

    if args.pipeline_master:  # subprocess leg: print its own JSON and exit
        print(json.dumps(run_pipeline_leg(args.pipeline_master, source)))
        return

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    queries = time_queries(sf_dir, cpus)

    t0 = time.time()
    _warm_page_cache(source)
    first_read_s = round(time.time() - t0, 2)

    legs = {}
    for master, cpus in (("local[8]", "0-7"), ("local[32]", "0-31")):
        # OS-level pinning: a local[N] JVM still spawns N python workers
        # on top of N task threads; taskset makes "N cores vs 4N cores"
        # true at the hardware level (the executor-host stand-in).
        prefix = ["taskset", "-c", cpus] if shutil.which("taskset") else []
        _warm_page_cache(source)
        r = subprocess.run(
            prefix
            + [sys.executable, os.path.abspath(__file__), "--pipeline-master", master],
            capture_output=True,
            text=True,
            cwd=REPO,
        )
        line = [l for l in r.stdout.strip().splitlines() if l.startswith("{")][-1]
        legs[master] = json.loads(line)

    t8, t32 = legs["local[8]"]["wall_s"], legs["local[32]"]["wall_s"]
    c8, c32 = legs["local[8]"]["compute_wall_s"], legs["local[32]"]["compute_wall_s"]
    sf = sf_dir.rstrip("/").split("sf")[-1]
    result = {
        "metric": "total_headline_query_sec",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "pipeline": {
            "rows": legs["local[32]"]["rows"],
            "source_bytes": os.path.getsize(source),
            "source_read_s_before_warm": first_read_s,
            "end_to_end": {
                "wall_s_local8": t8,
                "wall_s_local32": t32,
                "images_per_sec_local8": legs["local[8]"]["images_per_sec"],
                "images_per_sec_local32": legs["local[32]"]["images_per_sec"],
                "scaling_efficiency_8_to_32": round((t8 / t32) / 4.0, 3),
            },
            "parse_compute": {
                "wall_s_local8": c8,
                "wall_s_local32": c32,
                "cold_wall_s_local8": legs["local[8]"]["compute_cold_wall_s"],
                "cold_wall_s_local32": legs["local[32]"]["compute_cold_wall_s"],
                "images_per_sec_local8": legs["local[8]"]["compute_images_per_sec"],
                "images_per_sec_local32": legs["local[32]"]["compute_images_per_sec"],
                "scaling_efficiency_8_to_32": round((c8 / c32) / 4.0, 3),
            },
            "phase_wall_s_local32": legs["local[32]"]["phase_wall_s"],
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
