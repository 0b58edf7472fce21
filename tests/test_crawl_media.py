"""End-to-end flagship crawl: synthetic web -> media items -> pixel
verification, plus politeness/robots/seen-set behavior and
kill-and-resume from checkpoint (north-rule mandates)."""

import json
import shutil

import pytest
from pyspark.sql import functions as F

from spatula_spark.plans.engine import CrawlConfig, CrawlEngine
from spatula_spark.plans.media_pipeline import (
    crawl_items_df,
    media_registry,
    verify_media,
)
from spatula_spark.sources.synthweb import (
    SynthWeb,
    caption_for,
    expected_detail_urls,
)


@pytest.fixture(scope="module")
def web():
    return SynthWeb(n_hosts=3, details_per_host=30, details_per_list=10,
                    skew=2, with_errors=False, with_flaky=True)


@pytest.fixture(scope="module")
def store(spark, web):
    df = web.page_store(spark)
    df.persist().count()
    return df


def test_full_crawl_reaches_every_detail(spark, web, store):
    eng = CrawlEngine(spark, media_registry(), page_store=store,
                      config=CrawlConfig())
    res = eng.crawl(web.seeds())
    got = {r["url"] for r in crawl_items_df(res.results).collect()}
    assert got == expected_detail_urls(web)
    # cross-host duplicate links were deduped: each URL exactly once
    items = crawl_items_df(res.results)
    assert items.count() == items.select("url").distinct().count()
    # seen set == every fetched URL (details + list pages)
    n_lists = int(store.filter("kind = 'list'").count())
    assert res.seen.count() == len(expected_detail_urls(web)) + n_lists


def test_media_invariants(spark, web, store):
    eng = CrawlEngine(spark, media_registry(), page_store=store,
                      config=CrawlConfig())
    res = eng.crawl(web.seeds())
    items = crawl_items_df(res.results)
    ver = verify_media(items, web.media(spark))
    rows = ver.collect()
    assert len(rows) == web.n_media
    assert all(r["pixels_ok"] for r in rows)
    assert all(r["phash_ok"] for r in rows)
    assert all(r["psnr_db"] >= 40.0 for r in rows)
    for r in rows:
        idx = int(r["image_id"][4:])
        assert r["caption"] == caption_for(idx)  # exact-equality invariant


def test_politeness_budget_defers_not_drops(spark, web, store):
    eng = CrawlEngine(spark, media_registry(), page_store=store,
                      config=CrawlConfig(host_budget_per_wave=7))
    res = eng.crawl(web.seeds())
    got = {r["url"] for r in crawl_items_df(res.results).collect()}
    assert got == expected_detail_urls(web)  # nothing lost, only deferred
    # the budget stretches the crawl over more waves
    unlimited = CrawlEngine(spark, media_registry(), page_store=store,
                            config=CrawlConfig()).crawl(web.seeds())
    assert res.waves > unlimited.waves


def test_crawl_real_jpeg_payloads(spark):
    """End-to-end with REAL JFIF entropy-coded payloads (lossy_codec=
    'jpeg'): the crawl decodes them via magic dispatch and every media
    invariant (PSNR>=40, exact phash-of-ingested) holds."""
    w = SynthWeb(n_hosts=2, details_per_host=12, details_per_list=6,
                 skew=1, with_errors=False, with_flaky=False,
                 lossy_codec="jpeg")
    st = w.page_store(spark)
    eng = CrawlEngine(spark, media_registry(), page_store=st,
                      config=CrawlConfig())
    res = eng.crawl(w.seeds())
    items = crawl_items_df(res.results)
    ver = verify_media(items, w.media(spark)).collect()
    assert len(ver) == w.n_media
    assert all(r["pixels_ok"] for r in ver)
    assert all(r["phash_ok"] for r in ver)
    jpeg_rows = [r for r in ver if r["fmt"] == "jpeg"]
    assert jpeg_rows and all(40.0 <= r["psnr_db"] < 99.0 for r in jpeg_rows)


def test_shuffle_fetch_fallback_matches_broadcast(spark, web, store):
    """Waves above ``broadcast_fetch_max`` take the bucketed shuffle
    join against the url_hash-partitioned store copy instead of the
    broadcast-frontier probe; both strategies must produce identical
    crawls (broadcast_fetch_max=0 forces the fallback on every wave)."""
    default = CrawlEngine(spark, media_registry(), page_store=store,
                          config=CrawlConfig())
    forced = CrawlEngine(spark, media_registry(), page_store=store,
                         config=CrawlConfig(broadcast_fetch_max=0))
    r1 = default.crawl(web.seeds())
    r2 = forced.crawl(web.seeds())
    assert r1.items() == r2.items()
    assert r1.seen.count() == r2.seen.count()
    assert r1.waves == r2.waves


def test_store_keys_antijoin_fallback_matches_broadcast(spark, web, store):
    """Big stores must NOT broadcast their whole url_hash column for
    the 404 anti-join (O(|store|) memory per wave): forcing the
    shuffle-anti-join path (broadcast_store_keys_max=0) must produce
    an identical crawl."""
    default = CrawlEngine(spark, media_registry(), page_store=store,
                          config=CrawlConfig())
    forced = CrawlEngine(spark, media_registry(), page_store=store,
                         config=CrawlConfig(broadcast_store_keys_max=0))
    r1 = default.crawl(web.seeds())
    r2 = forced.crawl(web.seeds())
    assert r1.items() == r2.items()
    assert r1.seen.count() == r2.seen.count()
    assert r1.waves == r2.waves


def test_politeness_table_with_nonpositive_budget_rejected(spark, store):
    """A budget_per_wave <= 0 row would defer that host's rows forever
    (the loop never drains) — the engine must refuse it at
    construction, same rule as default_budget's >= 1 check."""
    bad = spark.createDataFrame(
        [("h0.example", 0)], "host string, budget_per_wave int"
    )
    with pytest.raises(ValueError, match="budget_per_wave"):
        CrawlEngine(spark, media_registry(), page_store=store,
                    politeness=bad)


def test_broadcast_fetch_cap_derives_from_memory_budget(spark):
    """The default broadcast-fetch cap follows the driver heap (10% at
    ~150 B/row) instead of a fixed row count that OOMs stock 1 GiB
    drivers."""
    from spatula_spark.plans.engine import (
        _broadcast_rows_budget,
        _parse_jvm_mem,
    )

    assert _parse_jvm_mem("1g") == 1 << 30
    assert _parse_jvm_mem("4096m") == 4096 << 20
    assert _parse_jvm_mem("512k") == 512 << 10
    assert _parse_jvm_mem("12345") == 12345
    rows = _broadcast_rows_budget(spark)
    heap = _parse_jvm_mem(spark.conf.get("spark.driver.memory", "1g"))
    assert rows == max(10_000, int(heap * 0.10) // 150)
    # an engine with no explicit cap picks up the derived value
    eng = CrawlEngine(spark, media_registry(),
                      fetch_fn=lambda it: it, config=CrawlConfig())
    assert eng._bcast_fetch_max == rows


def test_virtual_fetcher_matches_store(spark):
    """The closed-form fetch_fn (synthweb.fetcher) must produce the
    same crawl as the materialized page-store join: identical item
    sets, per-item payload-derived values, and seen counts."""
    from spatula_spark.plans.media_pipeline import media_verify_registry

    # details_per_host >= 102 so the j%101 error and j%97 flaky rules
    # actually fire and their parity is exercised
    w = SynthWeb(n_hosts=3, details_per_host=110, details_per_list=60,
                 skew=1, with_errors=True, with_flaky=True)
    st = w.page_store_with_media(spark)
    eng_store = CrawlEngine(spark, media_verify_registry(), page_store=st,
                            config=CrawlConfig(use_bloom=False))
    eng_virtual = CrawlEngine(spark, media_verify_registry(),
                              fetch_fn=w.fetcher(),
                              config=CrawlConfig(use_bloom=False))
    r1 = eng_store.crawl(w.seeds())
    r2 = eng_virtual.crawl(w.seeds())
    i1 = r1.items()
    i2 = r2.items()
    assert i1 == i2
    assert all(it["pixels_ok"] for it in i1)
    assert r1.seen.count() == r2.seen.count()
    assert int(r1.metrics["handled_errors"].sum()) == \
        int(r2.metrics["handled_errors"].sum()) > 0


def test_robots_oversized_ruleset_uses_join(spark, web, store, monkeypatch):
    """Rule sets beyond the CASE-expression cap must NOT be silently
    truncated: the engine falls back to the broadcast-join path and
    still blocks (ADVICE r1)."""
    from spatula_spark.operators import politeness as pol
    from spatula_spark.plans.engine import CrawlEngine as CE

    monkeypatch.setattr(pol, "ROBOTS_EXPR_MAX_RULES", 2)
    # 3 real rules + the web's own -> over the (patched) cap
    import pyspark.sql.functions as F  # noqa: F401

    extra = spark.createDataFrame(
        [("h1.example.com", "/detail/13", False),
         ("h0.example.com", "/detail/7", False),
         ("nowhere.example.com", "/x", False),
         ("nowhere.example.com", "/y", False)],
        "host string, path_prefix string, allow boolean",
    )
    eng = CE(spark, media_registry(), page_store=store, robots=extra,
             config=CrawlConfig())
    assert eng._robots_join and eng._robots_rules is None
    res = eng.crawl(web.seeds())
    got = {r["url"] for r in crawl_items_df(res.results).collect()}
    blocked = {u for u in expected_detail_urls(web)
               if ("h1.example.com/detail/13" in u
                   or "h0.example.com/detail/7" in u)}
    assert blocked
    assert got == expected_detail_urls(web) - blocked
    assert int(res.metrics["blocked"].sum()) == len(blocked)
    # blocked rows land in the dead-letter stream, tagged
    assert res.dead.filter("emit_kind = 'blocked'").count() == len(blocked)


def test_robots_rfc9309_grammar(spark):
    """RFC 9309 matching as deployed (Google's reference matcher
    examples): ``*`` wildcards, ``$`` end anchor, longest-pattern
    precedence with allow-wins ties, query string included in the
    matched target. Both the compiled-CASE path and the oversized
    hybrid join path must agree with the spec on every row."""
    from spatula_spark.operators import politeness as P

    cases = [
        # (rules [(pattern, allow)], path[?query], expect_allowed)
        ([("/fish", False)], "/fish", False),
        ([("/fish", False)], "/fishheads/yummy.html", False),
        ([("/fish", False)], "/fish.php?id=anything", False),
        ([("/fish", False)], "/Fish.asp", True),
        ([("/fish", False)], "/catfish", True),
        ([("/fish", False)], "/?id=fish", True),
        ([("/fish*", False)], "/fish", False),
        ([("/fish*", False)], "/catfish", True),
        ([("/fish/", False)], "/fish", True),
        ([("/fish/", False)], "/fish/?id=anything", False),
        ([("/*.php", False)], "/index.php", False),
        ([("/*.php", False)], "/", True),
        ([("/*.php", False)], "/windows.PHP", True),
        ([("/*.php$", False)], "/filename.php", False),
        ([("/*.php$", False)], "/filename.php?parameters", True),
        ([("/*.php$", False)], "/filename.php/", True),
        ([("/fish*.php", False)], "/fishheads/catfish.php?parameters",
         False),
        ([("/fish*.php", False)], "/Fish.PHP", True),
        # precedence: longest pattern wins, allow beats disallow on ties
        ([("/p", True), ("/", False)], "/page", True),
        ([("/folder/", True), ("/folder", False)], "/folder/page", True),
        ([("/page", True), ("/*.htm", False)], "/page.htm", False),
        ([("/page", True), ("/*.ph", False)], "/page.php5", True),
        ([("/$", True), ("/", False)], "/", True),
        ([("/$", True), ("/", False)], "/page.htm", False),
        ([("/x", False)], "/y", True),  # no rule matches -> allowed
    ]
    rules = [(f"h{i}", pat, allow)
             for i, (rs, _, _) in enumerate(cases) for pat, allow in rs]
    frontier = spark.createDataFrame(
        [(f"http://h{i}{path}", f"h{i}", i)
         for i, (_, path, _) in enumerate(cases)],
        "url string, host string, case_id int",
    )

    compiled = frontier.withColumn(
        "_allowed", P.robots_allow_expr(rules)
    )
    got_case = {r["case_id"]: r["_allowed"] for r in compiled.collect()}

    robots_df = spark.createDataFrame(
        rules, "host string, path_prefix string, allow boolean"
    )
    prefix_df, wild = P.split_robots_rules(robots_df)
    assert wild and prefix_df.count() + len(wild) == len(rules)
    allowed_j, blocked_j = P.robots_broadcast_join(
        frontier, prefix_df, wild
    )
    got_join = {r["case_id"]: True for r in allowed_j.collect()}
    got_join.update({r["case_id"]: False for r in blocked_j.collect()})

    for i, (rs, path, want) in enumerate(cases):
        assert got_case[i] == want, (rs, path, "compiled")
        assert got_join[i] == want, (rs, path, "join")


def test_robots_blocks_prefix(spark, web, store):
    eng = CrawlEngine(spark, media_registry(), page_store=store,
                      robots=web.robots(spark), config=CrawlConfig())
    res = eng.crawl(web.seeds())
    got = {r["url"] for r in crawl_items_df(res.results).collect()}
    blocked = {u for u in expected_detail_urls(web)
               if "h1.example.com/detail/13" in u}
    assert blocked  # fixture actually exercises the rule
    assert got == expected_detail_urls(web) - blocked


def test_bloom_and_exact_agree(spark, web, store):
    base = CrawlConfig(use_bloom=False)
    bloom = CrawlConfig(use_bloom=True, bloom_min_seen=1,
                        bloom_shard_capacity=1 << 14)
    r1 = CrawlEngine(spark, media_registry(), page_store=store,
                     config=base).crawl(web.seeds())
    r2 = CrawlEngine(spark, media_registry(), page_store=store,
                     config=bloom).crawl(web.seeds())
    u1 = sorted(r["url"] for r in crawl_items_df(r1.results).collect())
    u2 = sorted(r["url"] for r in crawl_items_df(r2.results).collect())
    assert u1 == u2
    assert r1.seen.count() == r2.seen.count()


def test_dfs_order_matches_document_order(spark, web, store):
    """Within one list page, detail items must appear in link (document)
    order after the path sort — the reference's DFS guarantee."""
    eng = CrawlEngine(spark, media_registry(), page_store=store,
                      config=CrawlConfig())
    res = eng.crawl(web.seeds())
    items = crawl_items_df(res.results.orderBy("path")).collect()
    per_host: dict[str, list[int]] = {}
    for r in items:
        host = r["url"].split("/")[2]
        per_host.setdefault(host, []).append(
            int(r["url"].rsplit("/", 1)[1])
        )
    for host, seq in per_host.items():
        own = [j for j in seq]
        # each host's own details arrive in strictly increasing order
        # except cross-host dups (j==0 handled by dedup: appears once)
        assert own == sorted(own), host


def test_driver_caps_derive_from_heap(spark, store):
    """The driver-python-structure caps scale with the provisioned
    driver heap when left at their None defaults (the round-4
    'literals don't scale' amber): 5% of heap at the structure's
    bytes/key, never below the 10k floor; explicit ints still win."""
    from spatula_spark.plans.engine import _parse_jvm_mem

    eng = CrawlEngine(spark, media_registry(), page_store=store,
                      config=CrawlConfig())
    heap = _parse_jvm_mem(spark.conf.get("spark.driver.memory"))
    assert eng._driver_store_keys_max == max(10_000, int(heap * 0.05) // 80)
    assert eng._driver_seen_max == max(10_000, int(heap * 0.05) // 130)
    pinned = CrawlEngine(
        spark, media_registry(), page_store=store,
        config=CrawlConfig(driver_store_keys_max=123,
                           driver_seen_max=456))
    assert pinned._driver_store_keys_max == 123
    assert pinned._driver_seen_max == 456


def test_checkpoint_resume_identical(spark, web, store, tmp_path):
    ck = str(tmp_path / "ck")
    full = CrawlEngine(spark, media_registry(), page_store=store,
                       config=CrawlConfig()).crawl(web.seeds())
    # run 1: killed after 2 waves (simulated by max_waves)
    CrawlEngine(spark, media_registry(), page_store=store,
                config=CrawlConfig(checkpoint_dir=ck, max_waves=2)
                ).crawl(web.seeds())
    # run 2: resumes from the snapshot and finishes
    res = CrawlEngine(spark, media_registry(), page_store=store,
                      config=CrawlConfig(checkpoint_dir=ck)
                      ).crawl(web.seeds())
    got = {r["url"] for r in crawl_items_df(res.results).collect()}
    want = {r["url"] for r in crawl_items_df(full.results).collect()}
    assert got == want
    assert res.seen.count() == full.seen.count()
    shutil.rmtree(ck, ignore_errors=True)


def test_checkpoint_every_k_async_resume_identical(
        spark, web, store, tmp_path):
    """checkpoint_every=K commits a durable snapshot every K waves —
    the commit-IO knob (round-4 late-session band collapse pointed at
    the per-wave snapshot write) — accumulating the item/seen deltas
    between commits, and checkpoint_async overlaps the write with the
    next wave's compute on one background thread. Kill-and-resume must
    replay at most K-1 waves and finish byte-identical to an
    uncheckpointed crawl, and the dir listing must show the cadence
    (commit waves + final flush only, not every wave)."""
    import os

    ck = str(tmp_path / "ckk")
    full = CrawlEngine(spark, media_registry(), page_store=store,
                       config=CrawlConfig()).crawl(web.seeds())
    CrawlEngine(spark, media_registry(), page_store=store,
                config=CrawlConfig(checkpoint_dir=ck, max_waves=5,
                                   checkpoint_every=3,
                                   checkpoint_async=True)
                ).crawl(web.seeds())
    waves = sorted(int(e.split("=")[1]) for e in os.listdir(ck)
                   if e.startswith("wave="))
    # waves 0-4 ran; cadence commit at wave 2, tail flush at wave 4
    assert waves == [2, 4], waves
    res = CrawlEngine(spark, media_registry(), page_store=store,
                      config=CrawlConfig(checkpoint_dir=ck,
                                         checkpoint_every=3,
                                         checkpoint_async=True)
                      ).crawl(web.seeds())
    got = {r["url"] for r in crawl_items_df(res.results).collect()}
    want = {r["url"] for r in crawl_items_df(full.results).collect()}
    assert got == want
    assert res.seen.count() == full.seen.count()
    shutil.rmtree(ck, ignore_errors=True)


def test_checkpoint_seen_compaction_bounds_resume_fanin(
        spark, web, store, tmp_path):
    """checkpoint_compact_every=K rewrites the accumulated seen set as
    one seen_base every K deltas (Iceberg manifest-rewrite analogue),
    so resume reads one base + <K deltas no matter how many waves ran —
    without it a long crawl's resume unions every wave's little delta
    dir since wave 0. Kill-and-resume must stay byte-identical."""
    import os

    ck = str(tmp_path / "ckc")
    full = CrawlEngine(spark, media_registry(), page_store=store,
                       config=CrawlConfig()).crawl(web.seeds())
    CrawlEngine(spark, media_registry(), page_store=store,
                config=CrawlConfig(checkpoint_dir=ck, max_waves=2,
                                   checkpoint_compact_every=2)
                ).crawl(web.seeds())
    eng = CrawlEngine(spark, media_registry(), page_store=store,
                      config=CrawlConfig(checkpoint_dir=ck,
                                         checkpoint_compact_every=2))
    res = eng.crawl(web.seeds())
    got = {r["url"] for r in crawl_items_df(res.results).collect()}
    want = {r["url"] for r in crawl_items_df(full.results).collect()}
    assert got == want
    assert res.seen.count() == full.seen.count()

    last = max(int(e.split("=")[1]) for e in os.listdir(ck)
               if e.startswith("wave="))
    base_wave, deltas = eng._seen_sources(ck, upto=last)
    assert base_wave is not None  # compaction actually ran
    assert len(deltas) < 2  # bounded fan-in: fewer than K deltas live
    # the compacted view (base + post-base deltas) must equal the
    # union of every per-wave delta ever written
    live = [os.path.join(ck, f"wave={base_wave}", "seen_base")] + [
        os.path.join(ck, f"wave={w}", "seen_delta") for w in deltas]
    every_delta = [
        os.path.join(ck, e, "seen_delta") for e in os.listdir(ck)
        if e.startswith("wave=")
        and os.path.isdir(os.path.join(ck, e, "seen_delta"))
    ]
    a = {tuple(r) for r in spark.read.parquet(*live).collect()}
    b = {tuple(r) for r in spark.read.parquet(*every_delta).collect()}
    assert a == b
    # deltas are disjoint by construction (compaction relies on it)
    n_delta_rows = spark.read.parquet(*every_delta).count()
    assert n_delta_rows == len(b)
    shutil.rmtree(ck, ignore_errors=True)


def test_checkpoint_rollback_time_travel(spark, web, store, tmp_path):
    """resume_upto_wave=N rolls the crawl back to the wave=N snapshot
    (Iceberg rollback_to_snapshot analogue): later snapshots are
    deleted, the replay from N+1 reproduces the full run exactly, and
    the replayed snapshot chain is linear (a later plain resume sees
    only the replayed timeline)."""
    import os

    ck = str(tmp_path / "ckr")
    full = CrawlEngine(spark, media_registry(), page_store=store,
                       config=CrawlConfig(checkpoint_dir=ck)
                       ).crawl(web.seeds())
    waves_full = sorted(int(e.split("=")[1]) for e in os.listdir(ck)
                        if e.startswith("wave="))
    res = CrawlEngine(spark, media_registry(), page_store=store,
                      config=CrawlConfig(checkpoint_dir=ck,
                                         resume_upto_wave=1)
                      ).crawl(web.seeds())
    got = {r["url"] for r in crawl_items_df(res.results).collect()}
    want = {r["url"] for r in crawl_items_df(full.results).collect()}
    assert got == want
    assert res.seen.count() == full.seen.count()
    waves_replayed = sorted(int(e.split("=")[1]) for e in os.listdir(ck)
                            if e.startswith("wave="))
    assert waves_replayed == waves_full  # replay rebuilt the chain
    # rolling back past the first snapshot is an error, not a silent
    # from-scratch restart over a dirty checkpoint dir
    with pytest.raises(Exception, match="resume_upto_wave"):
        CrawlEngine(spark, media_registry(), page_store=store,
                    config=CrawlConfig(checkpoint_dir=ck,
                                       resume_upto_wave=-1)
                    ).crawl(web.seeds())
    shutil.rmtree(ck, ignore_errors=True)


def test_checkpoint_expiry_and_manifest_stats(spark, web, store, tmp_path):
    """checkpoint_expire_deltas deletes what each new seen_base
    supersedes (storage stays ~1x the seen set), manifests carry
    per-file byte/row stats from the parquet footers, resume from the
    live snapshot still works, and rolling back past the latest base
    fails loudly instead of rebuilding an incomplete seen set."""
    import json as _json
    import os

    ck = str(tmp_path / "cke")
    cfg = CrawlConfig(checkpoint_dir=ck, checkpoint_compact_every=2,
                      checkpoint_expire_deltas=True)
    res = CrawlEngine(spark, media_registry(), page_store=store,
                      config=cfg).crawl(web.seeds())
    n_items = res.results.count()

    wave_dirs = sorted(
        (int(e.split("=")[1]), os.path.join(ck, e))
        for e in os.listdir(ck) if e.startswith("wave=")
    )
    bases = [w for w, d in wave_dirs
             if os.path.isdir(os.path.join(d, "seen_base"))]
    assert len(bases) == 1  # superseded bases expired
    for w, d in wave_dirs:
        if w <= bases[0]:  # superseded deltas expired
            assert not os.path.isdir(os.path.join(d, "seen_delta"))

    # manifest file stats: footer row counts sum to the real item count
    total_item_rows = 0
    for w, d in wave_dirs:
        with open(os.path.join(d, "MANIFEST.json")) as f:
            mf = _json.load(f)
        total_item_rows += sum(
            fi["rows"] or 0 for fi in mf["files"].get("items", ())
        )
        assert all(fi["bytes"] > 0 for grp in mf["files"].values()
                   for fi in grp)
    assert total_item_rows == n_items

    # resume of the finished crawl reproduces it from the live snapshot
    res2 = CrawlEngine(spark, media_registry(), page_store=store,
                       config=cfg).crawl(web.seeds())
    a = {r["url"] for r in crawl_items_df(res2.results).collect()}
    b = {r["url"] for r in crawl_items_df(res.results).collect()}
    assert a == b
    assert res2.seen.count() == res.seen.count()

    # rollback to a wave whose deltas were expired must raise
    with pytest.raises(Exception, match="expired"):
        CrawlEngine(spark, media_registry(), page_store=store,
                    config=CrawlConfig(checkpoint_dir=ck,
                                       resume_upto_wave=max(0, bases[0] - 1))
                    ).crawl(web.seeds())
    # and the refused rollback must leave the live chain untouched
    res3 = CrawlEngine(spark, media_registry(), page_store=store,
                       config=cfg).crawl(web.seeds())
    assert res3.seen.count() == res.seen.count()
    shutil.rmtree(ck, ignore_errors=True)


def test_scout_lists_only_first_level(spark, web, store):
    eng = CrawlEngine(spark, media_registry(), page_store=store,
                      config=CrawlConfig())
    out = eng.scout(web.seeds()[:1])
    # scout follows pagination but not children: every child of every
    # list page in host 0's chain is reported, none fetched
    nexts = {d["__next__"] for d in out if d["__next__"]}
    assert all(n.startswith("MediaDetailPage source=http://") for n in nexts)
    # scout does not dedup (nothing is fetched — reference semantics):
    # every link of every list page is reported, including the one
    # cross-host duplicate per list page
    n_details = web.offsets[1] - web.offsets[0]
    n_lists = (n_details + web.details_per_list - 1) // web.details_per_list
    assert len(out) == n_details + n_lists


def test_driver_wave_fast_path_parity(spark, web, store):
    """The small-wave driver path (Python dedup + keyset fetch +
    LocalRelation materialization) must be invisible: identical item
    stream, DFS order, wave assignment, and seen set vs the cluster
    path (driver_wave_max=0 disables every driver-side shortcut)."""
    fast = CrawlEngine(spark, media_registry(), page_store=store,
                       config=CrawlConfig()).crawl(web.seeds())
    slow = CrawlEngine(spark, media_registry(), page_store=store,
                       config=CrawlConfig(driver_wave_max=0)
                       ).crawl(web.seeds())
    cols = ["path", "page_cls", "item_json", "wave"]
    got = [tuple(r) for r in
           fast.results.orderBy("path").select(*cols).collect()]
    want = [tuple(r) for r in
            slow.results.orderBy("path").select(*cols).collect()]
    assert got == want
    assert (sorted(tuple(r) for r in fast.seen.collect())
            == sorted(tuple(r) for r in slow.seen.collect()))


def test_driver_wave_fast_path_parity_doc_tree(spark):
    """Deep-chain shape (13 binary-tree waves at sf0.001): the fast
    path handles every wave after the first two; results must match
    the cluster path row for row."""
    from spatula_spark.plans.doc_pipeline import crawl_doc_tree

    sf = "/root/testdata/sf0.001"
    fast = crawl_doc_tree(spark, sf)
    slow = crawl_doc_tree(
        spark, sf,
        config=CrawlConfig(target_partitions=8, broadcast_fetch_max=0,
                           driver_wave_max=0),
    )
    got = [tuple(r) for r in fast.orderBy("doc_id").collect()]
    want = [tuple(r) for r in slow.orderBy("doc_id").collect()]
    assert got == want
    # wave really is the BFS depth
    import math
    assert all(w == int(math.log2(d + 1)) for d, _, _, w in got)


def test_iceberg_backend_requires_catalog(spark, web, store):
    """Explicit iceberg_table_prefix without a configured catalog (this
    container ships no Iceberg runtime jar) fails loudly with guidance
    instead of silently degrading to the parquet analogue."""
    from spatula_spark.plans.engine import CrawlError
    from spatula_spark.plans.iceberg import iceberg_available

    assert not iceberg_available(spark)
    eng = CrawlEngine(
        spark, media_registry(), page_store=store,
        config=CrawlConfig(iceberg_table_prefix="ice.crawl.t"),
    )
    with pytest.raises(CrawlError, match="no Iceberg catalog"):
        eng.crawl(web.seeds())


def _iceberg_ready():
    from spatula_spark.plans.iceberg import iceberg_available
    from spatula_spark.session import get_spark

    try:
        return iceberg_available(get_spark(cores=8, shuffle_partitions=8))
    except Exception:
        return False


@pytest.mark.skipif(
    not _iceberg_ready(),
    reason="no Iceberg catalog configured / runtime jar absent in this "
    "container (configure spark.sql.catalog.ice + iceberg-spark-runtime "
    "to exercise the catalog-native snapshot path)",
)
def test_iceberg_checkpoint_resume(spark, web, store):
    """Kill-and-resume contract on the REAL Iceberg backend — the twin
    of test_checkpoint_resume_identical, same assertions, catalog
    tables instead of the parquet-manifest analogue."""
    from spatula_spark.plans.iceberg import iceberg_catalogs

    prefix = f"{iceberg_catalogs(spark)[0]}.spatula_test.crawl"
    full = CrawlEngine(spark, media_registry(), page_store=store,
                       config=CrawlConfig()).crawl(web.seeds())
    CrawlEngine(spark, media_registry(), page_store=store,
                config=CrawlConfig(iceberg_table_prefix=prefix, max_waves=2)
                ).crawl(web.seeds())
    res = CrawlEngine(spark, media_registry(), page_store=store,
                      config=CrawlConfig(iceberg_table_prefix=prefix)
                      ).crawl(web.seeds())
    got = {r["url"] for r in crawl_items_df(res.results).collect()}
    want = {r["url"] for r in crawl_items_df(full.results).collect()}
    assert got == want
    assert res.seen.count() == full.seen.count()
