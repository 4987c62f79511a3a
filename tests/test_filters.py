"""Filters / predicates / canonical solvers vs reference golden cases."""

import numpy as np
import pyarrow as pa

from frontera_ray.fingerprint import sha1
from frontera_ray.filters import (
    blacklist_mask,
    canonical_solver_table,
    home_page_mask,
    is_home_page_url,
    is_valid_robotstxt,
    jid_mask,
    normalize_seed,
    parse_sitemap,
    same_domain_mask,
    solve_canonical_basic,
    solve_canonical_corporate,
)


def test_home_page_predicate():
    assert is_home_page_url("http://a.com/")
    assert is_home_page_url("http://a.com")
    # reference quirk preserved: paths carry a leading '/', so
    # '/index.html' does NOT match the literal 'index.html' entry
    # (strategy/discovery/__init__.py:25-36)
    assert not is_home_page_url("http://a.com/index.html")
    assert not is_home_page_url("http://a.com/?q=1")
    assert not is_home_page_url("http://a.com/page")
    m = home_page_mask(["http://a.com/", "http://a.com/x"])
    assert list(m) == [True, False]


def test_robots_validity():
    assert is_valid_robotstxt(["User-agent: *", "Disallow: /"])
    assert is_valid_robotstxt(["# comment", "", "Sitemap: http://a.com/s.xml"])
    assert is_valid_robotstxt(["﻿User-Agent: bot"])
    assert not is_valid_robotstxt(["<html>not robots</html>"])
    assert not is_valid_robotstxt([])
    assert not is_valid_robotstxt(["# only comments"])


def test_sitemap_parser():
    xml = """<?xml version="1.0"?>
    <urlset><url><loc>http://a.com/1</loc></url>
    <url><loc> http://a.com/2 </loc></url></urlset>"""
    out = list(parse_sitemap(xml))
    assert set(out) == {("http://a.com/1", False), ("http://a.com/2", False)}
    idx = """<sitemapindex><sitemap><loc>http://a.com/s1.xml</loc></sitemap>
    <sitemap><loc>http://a.com/s2.xml</loc></sitemap></sitemapindex>"""
    out = list(parse_sitemap(idx))
    assert set(out) == {("http://a.com/s1.xml", True), ("http://a.com/s2.xml", True)}
    mixed = """<x><url><loc>http://a.com/p</loc></url>
    <sitemap><loc>http://a.com/s.xml</loc></sitemap></x>"""
    assert set(parse_sitemap(mixed)) == {("http://a.com/p", False),
                                         ("http://a.com/s.xml", True)}


def test_blacklist_and_same_domain():
    urls = ["http://Bad.com/x", "http://ok.com/y", "http://sub.bad.com/z"]
    m = blacklist_mask(urls, {"bad.com"})
    # registrable-domain match (batch_generator._is_domain_blacklisted
    # checks meta['domain']['name']): sub.bad.com is dropped too
    assert list(m) == [False, True, False]
    # a full-hostname entry still matches itself only
    m_host = blacklist_mask(urls, {"sub.bad.com"})
    assert list(m_host) == [True, True, False]
    m2 = same_domain_mask("http://www.site.com/page",
                          ["http://site.com/a", "http://blog.site.com/b",
                           "http://other.com/c"])
    assert list(m2) == [True, True, False]


def test_jid_fencing():
    assert list(jid_mask([0, 1, 1, 2], 1)) == [False, True, True, False]


def test_canonical_basic_golden():
    # golden case: tests/test_canonical_solver.py:17-21
    url, fp, chain, chain_fps = solve_canonical_basic(
        "http://scrapinghub.com/", ["http://www.scrapinghub.com/"],
        [sha1("http://www.scrapinghub.com/")])
    assert url == "http://www.scrapinghub.com/"
    assert fp == sha1("http://www.scrapinghub.com/")
    assert chain == ["http://www.scrapinghub.com/", "http://scrapinghub.com/"]


def test_canonical_corporate_golden():
    # golden cases: tests/test_canonical_solver.py:24-41
    u, _, _, _ = solve_canonical_corporate(
        "http://google.com/404", ["http://www.yandex.ru/company/"],
        [sha1("http://www.yandex.ru/company/")])
    assert u == "http://www.yandex.ru/company/"
    u, _, _, _ = solve_canonical_corporate(
        "http://google.com", ["http://www.yandex.ru"], [sha1("http://www.yandex.ru")])
    assert u == "http://google.com"  # home-page source: keep target
    u, _, _, _ = solve_canonical_corporate(
        "http://www.yandex.ru/search", ["http://www.yandex.ru"],
        [sha1("http://www.yandex.ru")])
    assert u == "http://www.yandex.ru/search"  # same host: keep target


def test_canonical_solver_table():
    t = pa.table({
        "url": ["http://t.com/x", "http://plain.com/"],
        "redirect_urls": pa.array([["http://src.com/page"], []],
                                  pa.list_(pa.string())),
    })
    out = canonical_solver_table(t, mode="basic")
    assert out["canonical_url"].to_pylist() == ["http://src.com/page",
                                                "http://plain.com/"]


def test_seed_normalize():
    assert normalize_seed("  www.a.com  ") == "http://www.a.com"
    assert normalize_seed("https://b.com/x") == "https://b.com/x"
    assert normalize_seed("# comment") is None
    assert normalize_seed("   ") is None


def test_read_seeds_dataset(ray_session, tmp_path):
    from frontera_ray.filters import read_seeds_dataset

    p = tmp_path / "seeds.txt"
    p.write_text("http://a.com/1\n# comment\n\nwww.b.com\n")
    ds = read_seeds_dataset(str(p))
    assert sorted(r["url"] for r in ds.take_all()) == [
        "http://a.com/1", "http://www.b.com"]


def test_read_seeds_multiple_files(ray_session, tmp_path):
    """Seed reader accepts a list of files/URIs (S3-style multi-shard
    seed sources read the same way via pyarrow.fs)."""
    from frontera_ray.filters import read_seeds_dataset

    a = tmp_path / "seeds-a.txt"
    b = tmp_path / "seeds-b.txt"
    a.write_text("# part a\nwww.one.test/1\n\n")
    b.write_text("http://two.test/2\n  three.test/3  \n")
    ds = read_seeds_dataset([str(a), str(b)])
    urls = sorted(r["url"] for r in ds.take_all())
    assert urls == ["http://three.test/3", "http://two.test/2",
                    "http://www.one.test/1"]
