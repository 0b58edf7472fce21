"""Canonical end-to-end drive (the /verify recipe): synth web ->
crawl with robots + politeness -> media pixel/phash verification ->
driver-contract smoke (entry + one oracle query)."""

import sys

sys.path.insert(0, "/root/repo")

from spatula_spark import get_spark, CrawlEngine, CrawlConfig  # noqa: E402
from spatula_spark.sources.synthweb import (  # noqa: E402
    SynthWeb, expected_detail_urls,
)
from spatula_spark.plans.media_pipeline import (  # noqa: E402
    media_registry, crawl_items_df, verify_media,
)

spark = get_spark(cores=8, shuffle_partitions=8)
web = SynthWeb(n_hosts=3, details_per_host=120, details_per_list=40,
               skew=3, with_errors=True, with_flaky=True)
store = web.page_store(spark)
store.persist()
eng = CrawlEngine(spark, media_registry(), page_store=store,
                  robots=web.robots(spark),
                  config=CrawlConfig(host_budget_per_wave=200))
res = eng.crawl(web.seeds())
items = crawl_items_df(res.results)
got = {r["url"] for r in items.select("url").collect()}
want = set(expected_detail_urls(web))
# with_errors=True: every 101st detail per host 500s (handled error ->
# no item); robots disallow h1 /detail/13* -> blocked, no fetch
from spatula_spark.sources.synthweb import host_name  # noqa: E402

for k in range(web.n_hosts):
    cnt = web.offsets[k + 1] - web.offsets[k]
    for j in range(cnt):
        u = f"http://{host_name(k)}/detail/{j}"
        if j % 101 == 100 or (k == 1 and str(j).startswith("13")):
            want.discard(u)
assert got == want, (len(got), len(want), list(got ^ want)[:5])

ver = verify_media(items, web.media(spark))
bad = ver.filter("NOT pixels_ok OR NOT phash_ok").count()
assert bad == 0, f"{bad} media rows failed pixel/phash verify"
print(f"E2E OK: {len(got)} detail items, media verify clean, "
      f"waves={res.waves}, blocked={int(res.metrics['blocked'].sum())}")

import __spark_entry__ as e  # noqa: E402

df = e.entry(spark)
n = df.count()
assert n >= 0 and len(df.schema) > 0
print(f"entry() OK: {n} rows")
print("VERIFY PASS")
