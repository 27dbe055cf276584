"""One extra size-curve point: build + query the engine over an
N-conv transcripts corpus using bench.py's warmed-child protocol
(same settle gates, best-of-2/3 builds, warm query legs).

Usage: python tools/size_point.py [n_convs] [n_cpus] [reps]

Writes nothing to the repo — prints one JSON line per child run;
record the numbers in BASELINE.md by hand (with disclosures).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import bench  # noqa: E402


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    os.makedirs(bench.WORKDIR, exist_ok=True)
    corpus = os.path.join(bench.WORKDIR, f"transcripts_{n_convs}")
    warmup = os.path.join(bench.WORKDIR,
                          f"transcripts_{bench.WARMUP_CONVS}")
    missing = [p for p, n in ((corpus, n_convs),
                              (warmup, bench.WARMUP_CONVS))
               if not os.path.exists(os.path.join(p, "_SUCCESS"))]
    if missing:
        from moera_search_spark.fixtures import transcripts_df
        spark = bench.make_session(32, "size-point-gen")
        for p, n in ((corpus, n_convs), (warmup, bench.WARMUP_CONVS)):
            if p in missing:
                transcripts_df(spark, n).write.mode("overwrite") \
                    .parquet(p)
        spark.stop()

    for rep in range(reps):
        res = bench.spawn_child(n_cpus, corpus, warmup,
                                with_queries=(rep == 0),
                                tag=f"size{n_convs}r{rep}_")
        print(json.dumps({"n_convs": n_convs, "rep": rep, **res}),
              flush=True)


if __name__ == "__main__":
    main()
