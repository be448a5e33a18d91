"""U1-U7/F1/F7 unit tests — expected values derived by hand from the cited
reference code (SURVEY.md §5.1)."""

import pytest

from x227f_spark.urlutil import (
    Url,
    clean_page_url,
    host_is_valid,
    hosts_list_contains,
    page_id_of,
    shorten_host,
    source_filename,
    transform_image_url_bypass,
    transform_image_url_clean,
)
from x227f_spark.constants import crawl_delay_for_host


# ---- U1: PageId (data.rs:534-552) ----------------------------------------

@pytest.mark.parametrize("url,expected", [
    ("https://www.foo.com/a/b", "foo.com/a/b"),
    ("https://www.www.foo.com/a", "foo.com/a"),          # repeats stripped
    ("https://foo.com/", "foo.com"),
    ("https://foo.com", "foo.com"),
    ("https://foo.com/a/index.html", "foo.com/a"),        # trailing index.html
    ("https://foo.com/a/index.html/index.html", "foo.com/a"),  # repeats
    ("https://foo.com/a/index.html/", "foo.com/a/index.html"),  # order matters
    ("https://foo.com//a//", "foo.com/a"),
    # root index.html survives: after the leading-'/' strip the path is
    # "index.html", which does NOT end with "/index.html" (data.rs:546-547)
    ("https://foo.com/index.html", "foo.com/index.html"),
    ("http://foo.com:8080/x", "foo.com/x"),               # port not in PageId
    ("https://wwwx.com/a", "wwwx.com/a"),                 # not a www. prefix
])
def test_page_id(url, expected):
    assert page_id_of(url) == expected


def test_page_id_hostless():
    assert page_id_of("mailto:a@b.c") == ""


# ---- U2: page-URL cleanup (page.rs:301-346) --------------------------------

def _clean(u):
    return clean_page_url(Url.parse(u)).to_string()


def test_tracking_params_removed():
    assert _clean("https://a.com/p?ref=x&keep=1&si=y") == "https://a.com/p?keep=1"
    assert _clean("https://a.com/p?ref=x") == "https://a.com/p"


def test_youtube_watch_keeps_only_v():
    assert _clean("https://www.youtube.com/watch?t=5&v=abc&list=L") == \
        "https://www.youtube.com/watch?v=abc"


def test_youtu_be_rewrite():
    assert _clean("https://youtu.be/xyz789") == \
        "https://www.youtube.com/watch?v=xyz789"


def test_fragment_and_port():
    assert _clean("https://a.com:443/p#frag") == "https://a.com/p"
    assert _clean("http://a.com:80/p") == "http://a.com/p"
    assert _clean("http://a.com:8080/p") == "http://a.com:8080/p"


# ---- U3/U4: image-URL rewrites (image.rs:457-506) ---------------------------

def test_nextjs_unwrap():
    u = Url.parse("https://a.com/_next/image?url=%2Fimg%2Fb.png&w=88")
    assert transform_image_url_clean(u).to_string() == "https://a.com/img/b.png"


def test_imgur_bypass():
    u = Url.parse("https://i.imgur.com/x.png")
    out = transform_image_url_bypass(u).to_string()
    assert out.startswith("https://proxy.duckduckgo.com/iu/?u=")


def test_tinypic_archive_wrap():
    u = Url.parse("http://i52.tinypic.com/334ne3n.png")
    assert transform_image_url_bypass(u).to_string() == \
        "https://web.archive.org/web/0if_/http://i52.tinypic.com/334ne3n.png"


def test_bypass_leaves_normal_hosts():
    u = Url.parse("https://buttons.example/b.png")
    assert transform_image_url_bypass(u).to_string() == u.to_string()


# ---- U6: source_filename (data.rs:498-508) ---------------------------------

@pytest.mark.parametrize("url,expected", [
    ("https://a.com/img/button.v2.png", "button"),
    ("https://a.com/img/button.png/", "button"),
    ("https://a.com/", ""),
    ("https://a.com/noext", "noext"),
])
def test_source_filename(url, expected):
    assert source_filename(url) == expected


# ---- U7/P1: host shortening + crawl delays (ratelimiter.rs) -----------------

def test_shorten_host():
    assert shorten_host("a.b.c.com") == "b.c.com"
    assert shorten_host("b.com") is None


@pytest.mark.parametrize("host,delay", [
    ("jcink.net", 10),
    ("forum.jcink.net", 10),           # via shortening
    ("web.archive.org", 10),
    ("sub.web.archive.org", 10),
    ("neocities.org", 1),
    ("x.neocities.org", 1),
    ("example.com", 1),
    ("a.b.example.com", 1),
])
def test_crawl_delay(host, delay):
    assert crawl_delay_for_host(host) == delay


# ---- F1: host list membership (main.rs:300-309) -----------------------------

def test_hosts_list_contains():
    assert hosts_list_contains(("prlog.ru",), "prlog.ru")
    assert hosts_list_contains(("prlog.ru",), "sub.prlog.ru")
    assert not hosts_list_contains(("prlog.ru",), "xprlog.ru")


# ---- F7: host charset (page.rs:116-121) -------------------------------------

def test_host_charset():
    assert host_is_valid("a-b.c0.com")
    assert not host_is_valid("a_b.com")
    assert not host_is_valid("")
    assert not host_is_valid("ümlaut.de")


# ---- URL join behavior ------------------------------------------------------

def test_join_relative():
    base = Url.parse("https://a.com/dir/page.html")
    assert base.join("other.html").to_string() == "https://a.com/dir/other.html"
    assert base.join("/root.html").to_string() == "https://a.com/root.html"
    assert base.join("https://b.com/x").to_string() == "https://b.com/x"
    assert base.join("./x").to_string() == "https://a.com/dir/x"
    assert base.join("../x").to_string() == "https://a.com/x"


def test_join_empty_drops_fragment():
    base = Url.parse("https://a.com/p#frag")
    assert base.join("").to_string() == "https://a.com/p"


# ---- property tests (SURVEY §5.5) -------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

url_strategy = st.builds(
    lambda host, path, q: f"https://{host}/{path}" + (f"?{q}" if q else ""),
    st.from_regex(r"[a-z][a-z0-9-]{0,10}(\.[a-z]{2,5}){1,2}", fullmatch=True),
    st.from_regex(r"[a-zA-Z0-9_/.-]{0,30}", fullmatch=True),
    st.from_regex(r"([a-z]{1,5}=[a-z0-9]{0,5}(&[a-z]{1,5}=[a-z0-9]{0,5}){0,3})?",
                  fullmatch=True),
)


@given(url_strategy)
@settings(max_examples=200, deadline=None)
def test_page_id_idempotent(u):
    """canon(canon(u)) == canon(u): PageId of a PageId-display URL is stable."""
    pid = page_id_of(u)
    assert page_id_of(f"https://{pid}" if pid else "https://x.com") == \
        (page_id_of(f"https://{pid}") if pid else "x.com")


@given(url_strategy)
@settings(max_examples=200, deadline=None)
def test_clean_never_grows_plain_urls(u):
    """U2 on fragment-free, youtube-free URLs never grows the URL."""
    parsed = Url.parse(u)
    if parsed is None or "youtu" in (parsed.host or ""):
        return
    cleaned = clean_page_url(parsed)
    assert len(cleaned.to_string()) <= len(parsed.to_string())
