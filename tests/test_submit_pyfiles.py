"""spark-submit --py-files packaging smoke test (north-rule clause:
"ships as a spark-submit --py-files package runnable on multi-executor
clusters").

Builds dist/spatula_spark.zip with scripts/build_pyfiles.py, then runs
the real ``spark-submit --py-files`` entry point
(scripts/submit_crawl.py) in a CHILD JVM from a different cwd with
PYTHONPATH scrubbed — so ``import spatula_spark`` inside the submitted
job must resolve from the zip exactly as it would on a cluster — and
checks the crawled detail-URL set against the closed-form expectation.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_pyfiles_crawl(spark, tmp_path):
    from spatula_spark.sources.synthweb import SynthWeb, expected_detail_urls

    web = SynthWeb(n_hosts=2, details_per_host=30, details_per_list=10,
                   skew=2)
    store_p = str(tmp_path / "store")
    robots_p = str(tmp_path / "robots")
    out_p = str(tmp_path / "results")
    web.page_store(spark).write.mode("overwrite").parquet(store_p)
    web.robots(spark).write.mode("overwrite").parquet(robots_p)
    seeds_p = tmp_path / "seeds.json"
    seeds_p.write_text(json.dumps(web.seeds()))

    zip_out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "build_pyfiles.py")],
        capture_output=True, text=True, check=True,
    ).stdout.strip()
    assert zip_out.endswith("spatula_spark.zip") and os.path.exists(zip_out)

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only package source
    proc = subprocess.run(
        [
            "/opt/spark/bin/spark-submit",
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--py-files", zip_out,
            os.path.join(REPO, "scripts", "submit_crawl.py"),
            "--store", store_p,
            "--seeds", str(seeds_p),
            "--robots", robots_p,
            "--out", out_p,
        ],
        capture_output=True, text=True, timeout=600,
        cwd=str(tmp_path), env=env,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]

    from spatula_spark.plans.media_pipeline import crawl_items_df

    results = spark.read.parquet(out_p)
    got = {
        r.url for r in crawl_items_df(results).select("url").collect()
    }
    # web.robots() disallows /detail/13* on host 1 and the submitted
    # job enforces it — the packaging run must match the in-process
    # engine exactly, robots blocks included
    blocked = {u for u in expected_detail_urls(web)
               if "h1.example.com/detail/13" in u}
    assert blocked
    assert got == expected_detail_urls(web) - blocked
