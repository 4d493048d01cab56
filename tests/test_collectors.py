"""Golden-fixture collector tests — the port of the reference's URL
collector tests (tests/url_collector/*, 16 files): captured payload
shapes on disk, no live HTTP."""

from __future__ import annotations

import pytest

from welearn_datastack_spark.sources import collectors as C


@pytest.fixture(scope="module")
def fixtures(tmp_path_factory):
    d = tmp_path_factory.mktemp("payloads")
    (d / "urls.csv").write_text(
        "name,url\n"
        "a,https://example.org/a\n"
        "b,http://example.org/insecure\n"
        "c,https://example.org/c\n"
    )
    (d / "nested.json").write_text(
        '{"items": [{"meta": {"url": "https://x.org/1"}},'
        ' {"deep": {"deeper": {"url": "https://x.org/2"}}},'
        ' {"url": "ftp://x.org/skip"}]}'
    )
    (d / "feed.rss").write_text(
        "<rss><channel>"
        "<item><title>One</title><link>http://feeds.example.com/1</link></item>"
        "<item><title>Two</title><link>https://feeds.example.com/2</link></item>"
        "<item><title>Off-domain</title><link>https://other.com/3</link></item>"
        "</channel></rss>"
    )
    (d / "feed.atom").write_text(
        "<feed>"
        '<entry><link rel="self" href="https://a.org/self"/>'
        '<link rel="alternate" href="https://a.org/post1"/></entry>'
        '<entry><link rel="alternate" href="https://a.org/post2"/></entry>'
        "</feed>"
    )
    (d / "sitemap.xml").write_text(
        "<urlset><loc>https://s.org/p1</loc><loc>https://s.org/p2</loc></urlset>"
    )
    (d / "sitemap_index.xml").write_text(
        "<sitemapindex><loc>https://s.org/sub1.xml</loc><loc>https://s.org/sub2.xml</loc></sitemapindex>"
    )
    return d


def test_csv_collector(spark, fixtures):
    out = C.collect_csv_urls(spark, str(fixtures / "urls.csv"), "csvcorp")
    urls = sorted(r["url"] for r in out.collect())
    # https-only (P7), corpus attached
    assert urls == ["https://example.org/a", "https://example.org/c"]
    assert out.collect()[0]["corpus"] == "csvcorp"


def test_json_collector_any_depth(spark, fixtures):
    out = C.collect_json_urls(spark, str(fixtures / "nested.json"), "jsoncorp")
    assert sorted(r["url"] for r in out.collect()) == ["https://x.org/1", "https://x.org/2"]


def test_rss_collector_domain_filter_and_https_rewrite(spark, fixtures):
    out = C.collect_rss_urls(
        spark, str(fixtures / "feed.rss"), "rsscorp", domain="feeds.example.com"
    )
    urls = sorted(r["url"] for r in out.collect())
    # http rewritten to https (F21), off-domain dropped
    assert urls == ["https://feeds.example.com/1", "https://feeds.example.com/2"]


def test_atom_collector_alternate_links_only(spark, fixtures):
    out = C.collect_atom_urls(spark, str(fixtures / "feed.atom"), "atomcorp")
    assert sorted(r["url"] for r in out.collect()) == [
        "https://a.org/post1",
        "https://a.org/post2",
    ]


def test_sitemap_plain(spark, fixtures):
    out = C.collect_sitemap_urls(spark, str(fixtures / "sitemap.xml"), "smcorp")
    assert sorted(r["url"] for r in out.collect()) == ["https://s.org/p1", "https://s.org/p2"]


def test_sitemap_index_recursion(spark, fixtures):
    fetched = []

    def fetch(url):
        fetched.append(url)
        n = url[-5]
        return f"<urlset><loc>https://s.org/{n}/a</loc><loc>https://s.org/{n}/b</loc></urlset>"

    out = C.collect_sitemap_urls(
        spark, str(fixtures / "sitemap_index.xml"), "smcorp", fetch=fetch
    )
    assert len(out.collect()) == 4
    assert fetched == ["https://s.org/sub1.xml", "https://s.org/sub2.xml"]


def test_openalex_filter_predicates(spark):
    works = spark.createDataFrame(
        [
            ("w1", "cc-by", False, "gold", "pub-ok", "en"),
            ("w2", "proprietary", False, "gold", "pub-ok", "en"),  # license
            ("w3", "cc-by", True, "gold", "pub-ok", "en"),  # retracted
            ("w4", "cc-by", False, "green", "pub-ok", "en"),  # oa_status
            ("w5", "cc-by", False, "gold", "pub-bad", "en"),  # predatory (P9)
            ("w6", "cc-by", False, "diamond", "pub-ok", "fr"),
        ],
        ["id", "license", "is_retracted", "oa_status", "publisher_id", "lang"],
    )
    out = C.openalex_filter(works, publishers_to_avoid=["pub-bad"])
    assert sorted(r["id"] for r in out.collect()) == ["w1", "w6"]


def test_hal_date_to_epoch(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("2024-03-05T12:30:00",)], ["d"]).select(
        C.hal_date_to_epoch(F.col("d")).alias("epoch")
    )
    # date part only, UTC midnight (reference splits on 'T': hal.py:86-100)
    assert df.collect()[0]["epoch"] == 1709596800


def test_xml_attr_extraction(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [('<a href="x1"/><a id="7" href="x2"/>',)], ["xml"]
    ).select(C.extract_xml_attr(F.col("xml"), "a", "href").alias("hrefs"))
    assert df.collect()[0]["hrefs"] == ["x1", "x2"]


def test_rss_multiline_feed(spark, tmp_path):
    # real feeds put tags on separate lines — the tag regex must be DOTALL
    p = tmp_path / "multi.rss"
    p.write_text(
        "<rss>\n<channel>\n"
        "<item>\n  <title>One</title>\n  <link>https://m.org/1</link>\n</item>\n"
        "<item>\n  <link>https://m.org/2</link>\n</item>\n"
        "</channel>\n</rss>\n"
    )
    out = C.collect_rss_urls(spark, str(p), "rss")
    assert sorted(r["url"] for r in out.collect()) == ["https://m.org/1", "https://m.org/2"]


# ---------------------------------------------------------------------------
# S6 — Wikipedia collector fidelity (ref collectors/wikipedia_collector.py)
# ---------------------------------------------------------------------------


def _wiki_fetch_factory(seen_params):
    """Canned MediaWiki API: one category with cmcontinue pagination,
    one subcat, and a langlinks table."""

    def fetch(params):
        seen_params.append(params)
        if params["action"] == "categorymembers":
            cat = params["cmtitle"]
            if cat == "Category:Climate" and "cmcontinue" not in params:
                return {
                    "query": {
                        "categorymembers": [
                            {"type": "page", "title": "Sea level rise"},
                            {"type": "subcat", "title": "Category:Glaciers"},
                        ]
                    },
                    "continue": {"cmcontinue": "page2"},
                }
            if cat == "Category:Climate":  # second page via cmcontinue
                return {
                    "query": {
                        "categorymembers": [{"type": "page", "title": "Permafrost"}]
                    }
                }
            if cat == "Category:Glaciers":
                return {
                    "query": {"categorymembers": [{"type": "page", "title": "Ice core"}]}
                }
            return {"query": {"categorymembers": []}}
        # langlinks
        table = {
            "Sea_level_rise": "Élévation du niveau de la mer",
            "Ice_core": "Carotte de glace",
        }
        pages = []
        for t in params["titles"].split("|"):
            links = (
                [{"lang": params["lllang"], "title": table[t]}] if t in table else []
            )
            pages.append({"title": t, "langlinks": links})
        return {"query": {"pages": pages}}

    return fetch


def test_wikipedia_collector_pagination_recursion_translation(spark):
    import datetime as dt

    from welearn_datastack_spark.sources.wikipedia_collector import (
        WikipediaContainer,
        collect_wikipedia_urls,
    )

    seen = []
    out = collect_wikipedia_urls(
        spark,
        [WikipediaContainer("Category:Climate", depth=1, lang="en")],
        _wiki_fetch_factory(seen),
        now=dt.datetime(2026, 8, 13),
    )
    urls = sorted(r["url"] for r in out.collect())
    # cmcontinue page 2 (Permafrost) and subcat member (Ice core) present
    assert "https://en.wikipedia.org/wiki/Permafrost" in urls
    assert "https://en.wikipedia.org/wiki/Ice_core" in urls
    assert "https://en.wikipedia.org/wiki/Sea_level_rise" in urls
    # translated titles under the TARGET language domain
    assert (
        "https://fr.wikipedia.org/wiki/Élévation_du_niveau_de_la_mer" in urls
    )
    assert "https://fr.wikipedia.org/wiki/Carotte_de_glace" in urls
    assert len(urls) == 5

    # 10-day recency window reaches the API as cmstart
    # (ref wikipedia_collector.py:44)
    cm = [p for p in seen if p["action"] == "categorymembers"]
    assert all(p["cmstart"] == "2026-08-03T00:00:00Z" for p in cm)
    # pagination carried the token
    assert any("cmcontinue" in p for p in cm)
    # translation batched: the container's full title set (parent +
    # subcat, 3 titles) fits one <=50-title langlinks call, '|'-joined
    ll = [p for p in seen if p["action"] == "langlinks"]
    assert len(ll) == 1
    assert ll[0]["titles"] == "Ice_core|Permafrost|Sea_level_rise"


def test_wikipedia_collector_translation_batching(spark):
    """>50 titles → multiple langlinks calls of <=50 titles each
    (ref wikipedia_collector.py:188 batched(page_titles, 50))."""
    import datetime as dt

    from welearn_datastack_spark.sources.wikipedia_collector import (
        WikipediaContainer,
        collect_wikipedia_urls,
    )

    seen = []

    def fetch(params):
        seen.append(params)
        if params["action"] == "categorymembers":
            return {
                "query": {
                    "categorymembers": [
                        {"type": "page", "title": f"Page {i:03d}"} for i in range(120)
                    ]
                }
            }
        return {"query": {"pages": []}}

    out = collect_wikipedia_urls(
        spark,
        [WikipediaContainer("Category:Big", depth=0, lang="fr")],
        fetch,
        now=dt.datetime(2026, 8, 13),
    )
    assert out.count() == 120
    ll = [p for p in seen if p["action"] == "langlinks"]
    assert len(ll) == 3  # 120 titles -> 50+50+20
    assert all(len(p["titles"].split("|")) <= 50 for p in ll)
    # fr containers translate to en
    assert all(p["lllang"] == "en" for p in ll)
