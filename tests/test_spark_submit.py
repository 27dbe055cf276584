"""End-to-end ``spark-submit --py-files`` smoke.

The north rule's deployment shape: the engine ships as a zip
(tools/make_submit_zip.py) and runs via ``spark-submit --py-files``
in its own JVM (tools/submit_build.py) — the reference's deployment
analogue is the Spring Boot service jar (reference: pom.xml,
application.yml).  This test builds an index and queries it through
TWO fresh spark-submit processes, then asserts the result is
rank- and score-identical to an in-process ``FTSIndex`` over the same
index directory: the deployment wrapper must not change any answer.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit")

pytestmark = pytest.mark.skipif(
    SPARK_SUBMIT is None, reason="spark-submit not on PATH")


def _run(args: list[str]) -> dict | list:
    env = dict(os.environ,
               PYSPARK_PYTHON=sys.executable,
               PYSPARK_DRIVER_PYTHON=sys.executable)
    env.pop("PYTHONPATH", None)   # the zip must be the only source
    out = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--conf", "spark.ui.enabled=false",
         "--conf", "spark.sql.session.timeZone=UTC",
         "--py-files", os.path.join(REPO, "dist",
                                    "moera_search_spark.zip"),
         os.path.join(REPO, "tools", "submit_build.py")] + args,
        capture_output=True, text=True, timeout=600, env=env)
    assert out.returncode == 0, out.stderr[-2000:]
    payload = [ln for ln in out.stdout.splitlines()
               if ln.startswith("{") or ln.startswith("[")]
    assert payload, out.stdout[-2000:]
    return json.loads(payload[-1])


@pytest.fixture(scope="module")
def submit_env(spark, tmp_path_factory):
    from moera_search_spark.fixtures import transcripts_df

    root = tmp_path_factory.mktemp("submit")
    zip_rc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools",
                                      "make_submit_zip.py")],
        capture_output=True, text=True)
    assert zip_rc.returncode == 0, zip_rc.stderr
    corpus = str(root / "transcripts")
    transcripts_df(spark, 300).write.mode("overwrite").parquet(corpus)
    return {"root": root, "corpus": corpus,
            "index_dir": str(root / "idx")}


class TestSparkSubmitDeployment:
    def test_build_then_query_matches_in_process(self, submit_env,
                                                 spark):
        from moera_search_spark.query import FTSIndex

        res = _run(["build", "--input", submit_env["corpus"],
                    "--index-dir", submit_env["index_dir"],
                    "--n-buckets", "8", "--n-term-buckets", "4"])
        assert res["n_docs"] > 0

        got = _run(["query", "--index-dir", submit_env["index_dir"],
                    "--text", "spark query window", "--k", "5"])
        assert len(got) == 5

        with FTSIndex(spark, submit_env["index_dir"]) as idx:
            want = [{"doc_id": r["doc_id"], "score": r["score"]}
                    for r in idx.search("spark query window",
                                        k=5).collect()]
        assert got == want

    def test_update_merge_query_roundtrip(self, submit_env, spark):
        """update --merge-every + the merge subcommand through the CLI.

        Runs after the build test (module-ordered): appends an upsert
        batch, lets --merge-every 1 consolidate it, runs a standalone
        merge (must no-op gracefully), then asserts CLI query parity
        with an in-process FTSIndex over the merged directory.
        """
        from pyspark.sql import functions as F

        from moera_search_spark.fixtures import transcripts_df
        from moera_search_spark.query import FTSIndex

        root = submit_env["root"]
        delta = transcripts_df(spark, 340) \
            .filter(F.col("conv_id") >= "conv-00000030") \
            .withColumn("op", F.lit("upsert"))
        changelog = str(root / "changelog")
        delta.write.mode("append").parquet(changelog)

        res = _run(["update", "--changelog", changelog,
                    "--index-dir", submit_env["index_dir"],
                    "--checkpoint-dir", str(root / "ckpt"),
                    "--merge-every", "1"])
        assert res["status"] == "drained"

        res = _run(["merge", "--index-dir", submit_env["index_dir"]])
        assert res.get("skipped") is True          # already auto-merged

        got = _run(["query", "--index-dir", submit_env["index_dir"],
                    "--text", "spark query window", "--k", "5"])
        with FTSIndex(spark, submit_env["index_dir"]) as idx:
            want = [{"doc_id": r["doc_id"], "score": r["score"]}
                    for r in idx.search("spark query window",
                                        k=5).collect()]
        assert got == want
