"""spark-submit entry point for the index build / update / query jobs.

Packaging (north_rule: "run via spark-submit --py-files on a
multi-executor cluster"):

    python tools/make_submit_zip.py                  # → dist/moera_search_spark.zip
    spark-submit --py-files dist/moera_search_spark.zip \\
        tools/submit_build.py build \\
        --input /data/transcripts --index-dir /data/fts_index \\
        --n-buckets 4096 [--resume]

Subcommands:
    build   — full (or resumed) index build from a transcripts table
    update  — apply one change-log delta batch (parquet with op column);
              --merge-every N auto-consolidates as segments accumulate
    merge   — tiered merge: consolidate delta segments (cost ∝ delta)
    compact — forced full merge: rebuild from live docs, exact df
    query   — top-k BM25 from the CLI (smoke/latency checks)

The driver config (master, executors, memory) comes from spark-submit;
this script only sets job-level knobs.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="submit_build")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build")
    b.add_argument("--input", required=True,
                   help="transcripts table path (parquet/iceberg dir)")
    b.add_argument("--index-dir", required=True)
    b.add_argument("--n-buckets", type=int, default=256)
    b.add_argument("--buckets-per-job", type=int, default=None)
    b.add_argument("--n-term-buckets", type=int, default=64)
    b.add_argument("--mode", default="english")
    b.add_argument("--format", default=None,
                   help="input format: iceberg | parquet | any Spark "
                        "source (default: auto-resolve, io.py)")
    b.add_argument("--resume", action="store_true")
    b.add_argument("--positions", action="store_true",
                   help="also build the positional table (enables "
                        "phrase queries; inherited by segments/compact)")

    u = sub.add_parser("update")
    u.add_argument("--changelog", required=True,
                   help="parquet dir: transcripts schema + op column")
    u.add_argument("--index-dir", required=True)
    u.add_argument("--checkpoint-dir", required=True)
    u.add_argument("--merge-every", type=int, default=None,
                   help="auto-run merge_segments when this many "
                        "unmerged delta batches have accumulated")

    m = sub.add_parser("merge")
    m.add_argument("--index-dir", required=True)

    c = sub.add_parser("compact")
    c.add_argument("--index-dir", required=True)
    c.add_argument("--n-buckets", type=int, default=256)

    q = sub.add_parser("query")
    q.add_argument("--index-dir", required=True)
    q.add_argument("--text", required=True)
    q.add_argument("--k", type=int, default=10)
    q.add_argument("--method", default="auto",
                   choices=["auto", "exhaustive", "pruned"])
    q.add_argument("--slop", type=int, default=0,
                   help="phrase slop (0 = exact; >0 = Lucene sloppy "
                        "sweep, distinct-term phrases)")
    q.add_argument("--phrase", action="store_true",
                   help="exact-phrase query (requires a positional "
                        "index; --method is ignored)")

    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName(
        f"moera-search-spark-{args.cmd}").getOrCreate()

    if args.cmd == "build":
        from moera_search_spark.build import build_index

        from moera_search_spark.io import read_transcripts

        res = build_index(
            spark, read_transcripts(spark, args.input, fmt=args.format),
            args.index_dir,
            mode=args.mode, n_buckets=args.n_buckets,
            buckets_per_job=args.buckets_per_job,
            n_term_buckets=args.n_term_buckets, resume=args.resume,
            positions=args.positions)
        print(json.dumps(res))
    elif args.cmd == "update":
        from moera_search_spark.streaming import stream_updates

        stream_updates(spark, args.index_dir, args.changelog,
                       checkpoint_dir=args.checkpoint_dir,
                       merge_every=args.merge_every)
        print(json.dumps({"status": "drained"}))
    elif args.cmd == "merge":
        from moera_search_spark.incremental import merge_segments

        print(json.dumps(merge_segments(spark, args.index_dir)))
    elif args.cmd == "compact":
        from moera_search_spark.incremental import compact

        print(json.dumps(compact(spark, args.index_dir,
                                 n_buckets=args.n_buckets)))
    elif args.cmd == "query":
        from moera_search_spark.query import FTSIndex

        idx = FTSIndex(spark, args.index_dir)
        if args.phrase:
            rows = idx.search_phrase(args.text, k=args.k,
                                     slop=args.slop).collect()
        else:
            rows = idx.search(args.text, k=args.k,
                              method=args.method).collect()
        print(json.dumps([{"doc_id": r["doc_id"], "score": r["score"]}
                          for r in rows]))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
