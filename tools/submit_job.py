"""Minimal spark-submit job — the north rule's packaging contract.

Run on any cluster manager with the package shipped via --py-files:

    cd /path/to/repo && zip -r /tmp/honas_spark.zip honas_spark
    spark-submit --master spark://head:7077 \
        --py-files /tmp/honas_spark.zip tools/submit_job.py OUT_DIR

The job imports honas_spark FROM THE SHIPPED ZIP (driver and executors
alike — no repo on sys.path), builds a windowed sketch table over the
deterministic synthetic corpus, probes one known member, and writes a
one-line JSON result to OUT_DIR/result.json.  tests/test_submit.py runs
it under `--master local[4]` as the sandbox stand-in for a cluster.
"""

import json
import sys

from pyspark.sql import SparkSession


def main(out_dir: str) -> None:
    spark = SparkSession.builder.appName("honas_submit_smoke").getOrCreate()
    # imported from the --py-files zip, not a local checkout
    import honas_spark
    from honas_spark import SketchSpec
    from honas_spark.operators import (
        build_sketches, sha256_key, with_window,
    )
    from honas_spark.search import make_search_job, run_search
    from honas_spark.sources.corpus import generate_corpus

    spec = SketchSpec(
        m_bits=1 << 16, k=8, num_filters=2, filters_per_user=1,
        cms_width=256, kll_k=64, window="1 hour",
    )
    corpus = generate_corpus(spark, 2000, n_hours=2)
    keyed = with_window(
        sha256_key(corpus, "path"), "commit_ts", spec.window
    )
    sk = build_sketches(
        keyed, spec, group_cols=["window_start"], client_col="repo",
        ts_col="commit_ts",
    )
    member = corpus.select("path").first()["path"]
    job = make_search_job({1: [member, "no/such/key.zz"]})
    key_df, _ = run_search(sk, spec, job, ["window_start"])
    rows = key_df.collect()
    result = {
        "package_file": honas_spark.__file__,
        "sketch_rows": sk.count(),
        "member_hits": sum(int(r["hits"]) for r in rows if r["key"] == member),
        "miss_rows": sum(1 for r in rows if r["key"] != member),
    }
    with open(f"{out_dir}/result.json", "w") as f:
        json.dump(result, f)
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1])
