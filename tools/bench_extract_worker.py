"""Single extraction-benchmark run in an isolated process.

Invoked by bench.py under ``taskset -c 0-(N-1)`` so the whole process tree
(JVM + Python workers) genuinely sees N CPUs — the honest sandbox proxy for
an N-executor cluster.  Prints one line: ``docs,secs``.

Usage: bench_extract_worker.py <cores> <sf_dir> <amplify> <text_repeat>
"""

import sys
import time

sys.path.insert(0, ".")

from graby_spark.extract import ExtractOptions
from graby_spark.job import run_extraction
from graby_spark.pages import build_pages_df, pages_ruleset
from graby_spark.session import get_spark


def main() -> None:
    cores, sf_dir, amplify, text_repeat = (
        int(sys.argv[1]),
        sys.argv[2],
        int(sys.argv[3]),
        int(sys.argv[4]),
    )
    spark = get_spark(app_name=f"bench-extract-{cores}", master=f"local[{cores}]", shuffle_partitions=cores)
    spark.sparkContext.setLogLevel("ERROR")
    opts = ExtractOptions(xss_filter=False)

    # warm-up (JVM + python workers)
    warm = build_pages_df(spark, sf_dir, repeat=1)
    run_extraction(spark, warm, pages_ruleset(), options=opts).count()

    pages = build_pages_df(spark, sf_dir, repeat=amplify, text_repeat=text_repeat)
    # synthesis already hash-distributes rows by doc_id across 2x-parallelism
    # partitions (the production analog: pages land hash-bucketed at ingest,
    # see graby_spark.manifest) — the extra salt shuffle would be redundant
    start = time.perf_counter()
    docs = (
        run_extraction(spark, pages, pages_ruleset(), options=opts, repartition=False)
        .where("is_success")
        .count()
    )
    secs = time.perf_counter() - start
    print(f"RESULT {docs} {secs:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
