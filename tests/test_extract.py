"""E1-E3 + image-scrape unit tests over the span encoding (page.rs:148-298,
image.rs:26-182 semantics)."""

from datetime import datetime, timedelta

import pytest

from x227f_spark import imagebytes
from x227f_spark.extract_logic import (
    CandidateButton,
    ImageResponse,
    candidate_scrape_order,
    extract_spans,
    pack_img_attrs,
    scrape_images,
)

BASE = "https://a.com/page.html"
NOW = datetime.fromisoformat("2026-01-01T00:00:00+00:00")


def spans(*items):
    return [(k, t, m, i) for i, (k, t, m) in enumerate(items)]


def img(src, alt="", title="", width="", height=""):
    return ("img", pack_img_attrs(alt, title, width, height), src)


def test_dedup_first_wins():
    res = extract_spans(spans(
        img("/b.png", alt="first"),
        img("/b.png", alt="second"),
    ), BASE)
    assert len(res.candidates) == 1
    assert res.candidates[0].alt == "first"


def test_dimension_filter():
    res = extract_spans(spans(
        img("/ok1.png"),                                  # no attrs → pass
        img("/ok2.png", width="88", height="31"),
        img("/bad1.png", width="100"),
        img("/bad2.png", width="88", height="32"),
        img("/ok3.png", width="notanumber"),              # unparseable → None
    ), BASE)
    assert [c.src.rsplit("/", 1)[-1] for c in res.candidates] == \
        ["ok1.png", "ok2.png", "ok3.png"]


def test_scheme_and_extension_filters():
    res = extract_spans(spans(
        img("ftp://a.com/x.png"),
        img("/vector.svg"),
        img("/icon.ico"),
        img("data:image/gif;base64,R0lGOD"),
        img("/fine.png"),
    ), BASE)
    assert [c.src for c in res.candidates] == \
        ["data:image/gif;base64,R0lGOD", "https://a.com/fine.png"]


def test_anchor_wrapping_and_href_rules():
    res = extract_spans(spans(
        ("anchor", "https://b.com/target", None),
        img("/btn.png"),
        ("anchor", "#bad-first-char", None),
        ("anchor", "mailto:x@y.z", None),
        ("anchor", "https://" + "x" * 260, None),
    ), BASE)
    assert res.candidates[0].href == "https://b.com/target"


def test_href_equals_img_src_not_a_link():
    res = extract_spans(spans(
        ("anchor", "https://a.com/btn.png", None),
        img("https://a.com/btn.png"),
    ), BASE)
    assert res.candidates[0].href is None


def test_internal_links_order_dedup_truncate():
    items = [("anchor", f"/p{i}.html", None) for i in range(12)]
    items.insert(3, ("anchor", "/p0.html", None))          # dup → first wins
    items.append(("anchor", BASE, None))                   # self → excluded
    items.append(("anchor", "https://other.com/x", None))  # external
    res = extract_spans(spans(*items), BASE)
    assert res.internal_links == [f"https://a.com/p{i}.html" for i in range(8)]


def test_internal_links_exclude_button_hrefs():
    res = extract_spans(spans(
        ("anchor", "/linked.html", None),
        img("/b.png"),
        ("anchor", "/plain.html", None),
    ), BASE)
    # /linked.html wraps the button → removed from internal links (E3)
    assert res.candidates[0].href == "https://a.com/linked.html"
    assert res.internal_links == ["https://a.com/plain.html"]


def test_tracking_param_cleanup_on_hrefs():
    res = extract_spans(spans(
        ("anchor", "/p.html?ref=tracker&keep=1", None),
    ), BASE)
    assert res.internal_links == ["https://a.com/p.html?keep=1"]


# ---- T5 rotation ------------------------------------------------------------

def test_rotation_order():
    assert candidate_scrape_order(5) == [0, 1, 2, 3, 4]
    order = candidate_scrape_order(120)
    assert order[:50] == list(range(70, 120))
    assert order[50:] == list(range(70))


# ---- image scraping (cache, budget, validation) ------------------------------

def _mk_images():
    ok = imagebytes.make_image("png", 88, 31, seed=1)
    bad = imagebytes.make_image("png", 100, 31, seed=2)
    return {
        "https://i.com/ok.png": ImageResponse(content_type="image/png", data=ok),
        "https://i.com/bad.png": ImageResponse(content_type="image/png", data=bad),
    }, ok


def test_scrape_valid_and_invalid():
    images, ok_bytes = _mk_images()
    cands = [CandidateButton(src="https://i.com/ok.png", alt="a", title=None),
             CandidateButton(src="https://i.com/bad.png", alt=None, title=None),
             CandidateButton(src="https://i.com/missing.png", alt=None, title=None)]
    out = scrape_images(cands, images.get, lambda u: None, NOW)
    assert out[0] is not None
    assert out[0].hash == imagebytes.hash_image(ok_bytes)
    assert out[0].file_ext == "png"
    assert out[1] is None          # wrong dims
    assert out[2] is None          # network error, no cache


def test_fresh_cache_hit_skips_fetch():
    cache = {"https://i.com/ok.png": ("cachedhash", "gif", NOW - timedelta(hours=1))}

    def explode(_u):
        raise AssertionError("network touched despite fresh cache")

    out = scrape_images([CandidateButton(src="https://i.com/ok.png",
                                         alt=None, title=None)],
                        explode, cache.get, NOW)
    assert out[0].hash == "cachedhash"
    assert out[0].file_ext == "gif"
    assert out[0].last_visited == NOW - timedelta(hours=1)


def test_stale_cache_fallback_on_error():
    stale = NOW - timedelta(hours=24 * 8)  # past the 168h TTL
    cache = {"https://i.com/gone.png": ("oldhash", "png", stale)}
    out = scrape_images([CandidateButton(src="https://i.com/gone.png",
                                         alt=None, title=None)],
                        lambda u: None, cache.get, NOW)
    assert out[0].hash == "oldhash"  # image.rs:108-125
    assert out[0].last_visited == stale


def test_abort_after_100_without_hits():
    images = {f"https://i.com/bad{i}.png": ImageResponse(
        content_type="image/png",
        data=imagebytes.make_image("png", 10, 10, seed=i)) for i in range(150)}
    seen = []

    def get(u):
        seen.append(u)
        return images.get(u)

    cands = [CandidateButton(src=f"https://i.com/bad{i}.png", alt=None,
                             title=None) for i in range(150)]
    out = scrape_images(cands, get, lambda u: None, NOW)
    assert all(b is None for b in out)
    assert len(seen) == 101  # stops after 101 scrapes with zero hits


def test_data_uri_button():
    import base64
    bmp = imagebytes.make_image("bmp", 88, 31, seed=3)
    uri = "data:image/bmp;base64," + base64.b64encode(bmp).decode()
    out = scrape_images([CandidateButton(src=uri, alt="inline", title=None)],
                        lambda u: None, lambda u: None, NOW)
    assert out[0] is not None
    assert out[0].source is None   # data: URIs have no source (image.rs:276)
    assert out[0].hash == imagebytes.hash_image(bmp)


def test_oversize_image_not_button():
    images = {"https://i.com/huge.png": ImageResponse(
        content_type="image/png",
        data=imagebytes.make_image("png", 88, 31, seed=4),
        declared_len=11 * 1024 * 1024)}
    out = scrape_images([CandidateButton(src="https://i.com/huge.png",
                                         alt=None, title=None)],
                        images.get, lambda u: None, NOW)
    assert out[0] is None


def test_image_redirect_followed():
    ok = imagebytes.make_image("gif", 88, 31, seed=5)
    images = {
        "https://i.com/moved.gif": ImageResponse(status=302,
                                                 redirect_to="https://i.com/real.gif"),
        "https://i.com/real.gif": ImageResponse(content_type="image/gif", data=ok),
    }
    out = scrape_images([CandidateButton(src="https://i.com/moved.gif",
                                         alt=None, title=None)],
                        images.get, lambda u: None, NOW)
    assert out[0].hash == imagebytes.hash_image(ok)
    assert out[0].source == "https://i.com/real.gif"  # final URL recorded


def test_image_redirect_loop_errors():
    images = {
        "https://i.com/a.gif": ImageResponse(status=302,
                                             redirect_to="https://i.com/b.gif"),
        "https://i.com/b.gif": ImageResponse(status=302,
                                             redirect_to="https://i.com/a.gif"),
    }
    out = scrape_images([CandidateButton(src="https://i.com/a.gif",
                                         alt=None, title=None)],
                        images.get, lambda u: None, NOW)
    assert out[0] is None


# ---- format sniffing / dimensions (X3/F10) -----------------------------------

@pytest.mark.parametrize("fmt", ["png", "gif", "bmp", "jpeg"])
def test_dimensions_roundtrip(fmt):
    data = imagebytes.make_image(fmt, 88, 31, seed=7)
    assert imagebytes.guess_format(data) == fmt
    assert imagebytes.image_dimensions(data) == (88, 31)
    assert imagebytes.validate_image_size(data) is True
    decoy = imagebytes.make_image(fmt, 89, 31, seed=7)
    assert imagebytes.validate_image_size(decoy) is False


def test_undecodable_tri_state():
    assert imagebytes.validate_image_size(b"garbage bytes here") is None


def test_data_uri_parse():
    assert imagebytes.parse_data_uri("image/gif;base64,!!!") is None
    raw = imagebytes.parse_data_uri("image/gif,abc%20def")
    assert raw == (b"abc def", "gif")
