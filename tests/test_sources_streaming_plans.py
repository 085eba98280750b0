"""Connectors (WARC), streaming postprocess chain, and physical-plan
quality assertions."""

import io
import os

import pytest
from pyspark.sql import functions as F

from disco_crawl_spark import corpus as corpus_mod, plans, refsem, sources, streaming


# ---------------------------------------------------------------------------
# WARC round-trip
# ---------------------------------------------------------------------------


def test_warc_parse_roundtrip_pure():
    body = b"<html><body><a href='/x'>x</a></body></html>"
    buf = io.BytesIO()
    sources.write_warc(
        [("https://a.gov.au/", "2024-01-01T00:00:00Z", body),
         ("https://b.gov.au/p", "2024-01-02T00:00:00Z", b"<p>two</p>")],
        buf)
    recs = sources.parse_warc_records(buf.getvalue())
    assert [r["url"] for r in recs] == ["https://a.gov.au/",
                                        "https://b.gov.au/p"]
    assert recs[0]["body"] == body
    assert recs[0]["status"] == 200
    assert recs[0]["content_type"].startswith("text/html")


def test_warc_parse_gzip():
    buf = io.BytesIO()
    sources.write_warc([("https://a.gov.au/", "2024-01-01T00:00:00Z",
                         b"<p>gz</p>")], buf, compress=True)
    recs = sources.parse_warc_records(buf.getvalue())
    assert len(recs) == 1 and recs[0]["body"] == b"<p>gz</p>"


def test_read_warc_spark(spark, tmp_path):
    p = tmp_path / "f.warc"
    with open(p, "wb") as f:
        sources.write_warc(
            [(f"https://h{i}.gov.au/", "2024-01-01T00:00:00Z",
              f"<html><body>page {i}</body></html>".encode())
             for i in range(5)], f)
    df = sources.read_warc(spark, str(p))
    rows = df.collect()
    assert len(rows) == 5
    assert all(r["html"] is not None for r in rows)
    assert str(rows[0]["warc_ts"]).startswith("2024-01-01")


# ---------------------------------------------------------------------------
# streaming postprocess
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def pages_dir(spark, tmp_path_factory):
    c = corpus_mod.generate(n_agencies=3, n_govcms=1, n_sections=2,
                            pages_per_section=2)
    d = tmp_path_factory.mktemp("pages")
    df = spark.createDataFrame(
        [(r["url"], r["warc_ts"], bytearray(r["html"]), r["text"], r["lang"],
              r.get("redirect_to"))
         for r in c.page_rows()],
        "url string, warc_ts timestamp, html binary, text string, lang string, redirect_to string")
    df.coalesce(2).write.mode("overwrite").parquet(str(d / "pages"))
    return c, str(d / "pages"), str(d)


def test_stream_postprocess_matches_batch_and_golden(spark, pages_dir):
    c, path, base = pages_dir
    q = streaming.run_postprocess_stream(
        spark, path, base + "/out", base + "/ckpt", available_now=True)
    q.awaitTermination(120)
    out = spark.read.parquet(base + "/out")
    rows = {r["url"]: r for r in out.collect()}
    assert len(rows) == len(c.pages)
    # byte-identical text vs the golden chain
    for url, r in rows.items():
        assert r["text_extracted"].encode() == c.pages[url]["text"].encode()
        assert r["readability"]["ARI"] == refsem.readability_scores(
            c.pages[url]["text"])["ARI"]
    # restart with same checkpoint: no duplicates (exactly-once fixes the
    # reference's documented duplicate bug)
    q2 = streaming.run_postprocess_stream(
        spark, path, base + "/out", base + "/ckpt", available_now=True)
    q2.awaitTermination(120)
    assert spark.read.parquet(base + "/out").count() == len(c.pages)


def test_batch_postprocess_memoizes(spark, pages_dir):
    c, path, base = pages_dir
    df = spark.read.parquet(path)
    # half the rows pretend to be already-processed (text present), half not
    df = df.withColumn(
        "text", F.when(F.crc32(F.col("url")) % 2 == 0, F.col("text")))
    out = streaming.run_postprocess_batch(df)
    rows = {r["url"]: r for r in out.collect()}
    assert len(rows) == len(c.pages)
    for url, r in rows.items():
        assert r["text_extracted"].encode() == c.pages[url]["text"].encode()


# ---------------------------------------------------------------------------
# plan quality (the .explain-and-iterate loop, pinned)
# ---------------------------------------------------------------------------


def test_filter_pushdown_to_parquet_scan(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    q = df.filter(F.col("event_type") == "click").select("event_id")
    assert plans.has_pushed_filter(q, "event_type")
    # column pruning: scan must not read all 6 columns
    rs = plans.scan_schema(q)
    assert "value" not in rs and "props" not in rs


def test_broadcast_join_for_small_dim(spark):
    from disco_crawl_spark import queries as q
    df = q.queries()["seen_anti_join"](spark, "/root/testdata/sf0.001")
    assert plans.uses_broadcast_join(df)


def test_tpch_q1_plan_quality(spark):
    from disco_crawl_spark import queries as q
    df = q.queries()["tpch_q1"](spark, "/root/testdata/sf0.001")
    assert plans.has_pushed_filter(df, "l_shipdate")
    # exactly one shuffle, with map-side partial aggregation before it
    assert plans.shuffle_count(df) == 1
    assert "partial_sum" in plans.explain_str(df, "simple")
    # column pruning: untouched columns never leave the scan
    assert "l_orderkey" not in plans.scan_schema(df)


@pytest.mark.parametrize("seen_filter", ["bloom", "cuckoo"])
def test_engine_seen_filter_path_equivalent(spark, tmp_warehouse, seen_filter):
    from disco_crawl_spark import refsim
    from disco_crawl_spark.engine import CrawlEngine
    c = corpus_mod.generate(n_agencies=3, n_govcms=1, n_sections=2,
                            pages_per_section=2)
    sim = refsim.Simulator(c).run()
    pages = spark.createDataFrame(
        [(r["url"], r["warc_ts"], bytearray(r["html"]), r["text"], r["lang"],
              r.get("redirect_to"))
         for r in c.page_rows()],
        "url string, warc_ts timestamp, html binary, text string, lang string, redirect_to string")
    eng = CrawlEngine(spark, pages, c.robots, c.hosts, tmp_warehouse,
                      seeds=c.seeds, seen_filter=seen_filter)
    eng.run()
    assert eng.crawl_order() == sim.order
    sim_seen = {(g, k) for g, ks in sim.url_seen.items() for k in ks}
    assert eng.url_seen_set() == sim_seen
