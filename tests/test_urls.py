"""URL canonicalization."""

from pyspark.sql import functions as F

from final_ocr_spark.functions.urls import normalize_url, registered_domain, url_parts


def _norm(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], ["u"])
    return [r["n"] for r in df.select(normalize_url(F.col("u")).alias("n")).collect()]


def test_normalize_url_pinned_rules(spark):
    cases = {
        "HTTP://WWW.Example.COM:80/Path/": "http://example.com/Path",
        "https://example.com:443/": "https://example.com/",
        "https://example.com:8443/x": "https://example.com:8443/x",
        "http://site.org/p?utm_source=x&b=2&a=1": "http://site.org/p?a=1&b=2",
        "http://site.org/p?gclid=1&fbclid=2&ref=3": "http://site.org/p",
        "http://site.org/p#section": "http://site.org/p",
        "http://site.org": "http://site.org/",
        "http://site.org///": "http://site.org/",
        "  http://a.b/c  ": "http://a.b/c",
        "not a url at all": "not a url at all",
    }
    got = _norm(spark, list(cases))
    assert got == list(cases.values())


def test_normalize_idempotent(spark):
    urls = ["HTTP://WWW.Example.COM:80/Path/?b=2&utm_x=1&a=1#f"]
    once = _norm(spark, urls)
    twice = _norm(spark, once)
    assert once == twice == ["http://example.com/Path?a=1&b=2"]


def test_registered_domain(spark):
    cases = {
        "sub.deep.example.com": "example.com",
        "example.com": "example.com",
        "news.bbc.co.uk": "bbc.co.uk",
        "bbc.co.uk": "bbc.co.uk",
        "localhost": "localhost",
    }
    df = spark.createDataFrame([(h,) for h in cases], ["h"])
    got = [r["d"] for r in df.select(registered_domain(F.col("h")).alias("d")).collect()]
    assert got == list(cases.values())


def test_url_parts(spark):
    df = spark.createDataFrame([("https://Host.COM:9090/a/b?q=1#z",)], ["u"])
    p = url_parts(F.col("u"))
    r = df.select(*[c.alias(k) for k, c in p.items()]).collect()[0].asDict()
    assert r == {"scheme": "https", "host": "host.com", "port": "9090",
                 "path": "/a/b", "query": "q=1"}


def test_ipv6_authorities(spark):
    cases = {
        "http://[::1]:8080/x": {"host": "[::1]", "port": "8080"},
        "https://[2001:db8::1]/y": {"host": "[2001:db8::1]", "port": ""},
    }
    df = spark.createDataFrame([(u,) for u in cases], ["u"])
    p = url_parts(F.col("u"))
    rows = df.select(p["host"].alias("h"), p["port"].alias("p")).collect()
    for (u, want), r in zip(cases.items(), rows):
        assert (r["h"], r["p"]) == (want["host"], want["port"]), u
    # normalization keeps the bracketed host intact
    assert _norm(spark, ["http://[::1]:8080/x/"]) == ["http://[::1]:8080/x"]
