"""Single-pass span extraction + image scraping semantics (E1-E3, T5, P8,
J1, S6/S7, F8-F10, U3/U4/U8).

This module is the *scalar* core shared verbatim by:

- the executable golden model (``x227f_spark.model``) — sequential oracle
- the Spark engine's Arrow-batch UDFs (``x227f_spark.operators.fetch``) —
  the same functions mapped over host-partitioned pandas batches

so that span-sequence parity between the two is true by construction.

Corpus span encoding (FIXTURES.md §1, input_hint shape):
  kind='text'   text=content,        media_ref=null
  kind='anchor' text=raw href attr,  media_ref=null
  kind='img'    text=alt US title US width US height (US = \\x1f, '' = absent)
                media_ref=raw src attr
An ``img`` span whose immediately preceding span (offset-1) is an ``anchor``
is wrapped by that anchor (flattening of ``<a href><img></a>``).

Reference cites: candidate_links_from_html /root/reference/src/scrape/page.rs:148-298,
scrape_images image.rs:26-65, scrape_image image.rs:68-182.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from . import imagebytes
from .urlutil import (
    Url,
    clean_page_url,
    transform_image_url_bypass,
    transform_image_url_clean,
)

US = "\x1f"  # unit separator packing img attrs into the span text field


def pack_img_attrs(alt: str = "", title: str = "", width: str = "", height: str = "") -> str:
    return US.join((alt, title, width, height))


def unpack_img_attrs(text: str | None) -> tuple[str, str, str, str]:
    parts = (text or "").split(US)
    parts += [""] * (4 - len(parts))
    return parts[0], parts[1], parts[2], parts[3]


@dataclass
class CandidateButton:
    """page.rs:348-359 — candidate img + wrapping anchor href."""

    src: str  # resolved img URL string
    alt: str | None
    title: str | None
    href: str | None = None  # cleaned wrapping-anchor href (U2-applied)


@dataclass
class ExtractResult:
    candidates: list[CandidateButton] = field(default_factory=list)
    internal_links: list[str] = field(default_factory=list)


def _parse_u32(s: str) -> int | None:
    """Rust ``s.parse::<u32>()`` — no sign, no whitespace, decimal only."""
    if s and s.isdigit():
        v = int(s)
        return v if v < 2**32 else None
    return None


def extract_spans(spans: list[tuple[str, str | None, str | None, int]], base_url: str,
                  tracking_params=("ref", "si"), max_internal_links: int = 8) -> ExtractResult:
    """E1+E2+E3 — one pass over a document's spans.

    ``spans``: (kind, text, media_ref, offset) sorted by offset.
    Mirrors page.rs:148-298 exactly; see module docstring for the encoding.
    """
    base = Url.parse(base_url)
    if base is None:
        return ExtractResult()
    spans = sorted(spans, key=lambda s: s[3])

    # ---- img pass (page.rs:161-213) -----------------------------------
    existing_img_urls: set[str] = set()
    candidates: list[CandidateButton] = []
    for kind, text, media_ref, _off in spans:
        if kind != "img":
            continue
        src_raw = media_ref or ""
        src = base.join(src_raw)
        if src is None:
            continue
        alt, title, width_s, height_s = unpack_img_attrs(text)
        alt_v = alt or None  # empty → absent (page.rs:168-177)
        title_v = title or None
        # F8 width/height: attr present and parseable must equal 88/31
        width = _parse_u32(width_s) if width_s else None
        height = _parse_u32(height_s) if height_s else None
        if not (width is None or width == 88) or not (height is None or height == 31):
            continue
        if src.scheme not in ("http", "https", "data"):
            continue
        path = src.opaque if src.opaque is not None else src.path
        if path.endswith(".svg") or path.endswith(".ico"):
            continue
        key = src.to_string()
        if key in existing_img_urls:  # O4 first-occurrence dedup
            continue
        existing_img_urls.add(key)
        candidates.append(CandidateButton(src=key, alt=alt_v, title=title_v))

    # ---- anchor pass (page.rs:227-283) ---------------------------------
    internal: list[str] = []
    internal_seen: set[str] = set()
    base_str = base.to_string()
    for idx, (kind, text, _media_ref, _off) in enumerate(spans):
        if kind != "anchor":
            continue
        href_raw = text or ""
        first = href_raw[:1]
        if not (first == "/" or first == "." or ("a" <= first <= "z") or ("A" <= first <= "Z")):
            continue
        href = base.join(href_raw)
        if href is None:
            continue
        if href.scheme not in ("http", "https"):
            continue
        if len(href.to_string()) > 256:
            continue
        href = clean_page_url(href, tracking_params)
        href_str = href.to_string()

        if href.host == base.host and href_str != base_str:
            if href_str not in internal_seen:
                internal_seen.add(href_str)
                internal.append(href_str)

        # wrapped img = next span is an img (flattened <a><img></a>)
        if idx + 1 >= len(spans) or spans[idx + 1][0] != "img":
            continue
        img_src_raw = spans[idx + 1][2] or ""
        img_src = base.join(img_src_raw)
        if img_src is None:
            continue
        img_key = img_src.to_string()
        if img_key not in existing_img_urls:
            continue
        if href_str == img_key:  # href == img src → not a page link
            continue
        for cand in candidates:
            if cand.src == img_key:
                cand.href = href_str  # last anchor wins (page.rs:282)
                break

    # ---- E3: internal links minus button hrefs, first 8 ----------------
    button_hrefs = {c.href for c in candidates if c.href is not None}
    internal = [l for l in internal if l not in button_hrefs][:max_internal_links]

    return ExtractResult(candidates=candidates, internal_links=internal)


# ---------------------------------------------------------------------------
# Image scraping (S6/S7 + J1 + F10 + U8 + T5 + P8) against a corpus fetcher
# ---------------------------------------------------------------------------

@dataclass
class ImageResponse:
    """One row of the ``images`` transport table."""

    status: int = 200
    content_type: str | None = None
    redirect_to: str | None = None
    data: bytes | None = None
    declared_len: int | None = None  # simulates >10MB without storing 10MB


@dataclass
class ButtonData:
    """data.rs:478-495."""

    source: str | None
    hash: str
    file_ext: str
    target: str | None
    last_visited: object  # datetime
    redirect_from: str | None = None  # RedirectSource.from (PageId string)
    redirect_last_visited: object | None = None
    alt: str | None = None
    title: str | None = None
    # transient: bytes of a freshly fetched 88x31 (S8 media sink); not part
    # of the page-state comparison
    fresh_bytes: bytes | None = None


def candidate_scrape_order(n: int, threshold: int = 100, rotate: int = 50) -> list[int]:
    """T5 — image.rs:36-41: if >threshold candidates, rotate_right(50)."""
    order = list(range(n))
    if n > threshold:
        order = order[-rotate:] + order[:-rotate]
    return order


def download_88x31_image(image_url_str: str, images_get, now) -> dict:
    """S6/S7 — image.rs:280-418 against a corpus lookup ``images_get(url)->
    ImageResponse|None``. Returns dict(ok, bytes, format, url, redirect_from)
    or dict(error=True).
    """
    u = Url.parse(image_url_str)
    if u is None:
        return {"error": True}
    if u.scheme == "data":
        parsed = imagebytes.parse_data_uri(u.opaque or "")
        if parsed is None:
            return {"error": True}
        data, fmt = parsed
        return {"ok": True, "bytes": data, "format": fmt, "url": None,
                "redirect_from": None}

    requesting = transform_image_url_bypass(u)
    was_transformed = requesting.to_string() != u.to_string()
    requesting_str = requesting.to_string()

    visited = {requesting_str}
    res = None
    while True:
        res = images_get(requesting_str)
        if res is None:
            return {"error": True}  # network error
        if res.redirect_to:
            requesting_str = res.redirect_to
        else:
            break
        if requesting_str in visited:
            break  # redirect loop
        visited.add(requesting_str)
        if len(visited) > 3:
            break  # too many redirects

    res_url = requesting_str
    if not (200 <= res.status < 300):
        return {"error": True}

    # Parity quirk (image.rs:333-340): with redirect::Policy::none the
    # response URL always equals the last requested URL, so on every success
    # path `res_url != requesting_url` is false and RedirectSource is never
    # recorded. We reproduce that: redirect_from stays None.
    redirect_from = None

    image_url_final = u.to_string() if was_transformed else res_url

    ct = res.content_type
    if ct is None:
        return {"error": True}
    if not ct.startswith("image/"):
        return {"error": True}

    data = res.data or b""
    total_len = res.declared_len if res.declared_len is not None else len(data)
    if total_len > 10 * 1024 * 1024:
        return {"ok": True, "bytes": b"", "format": None, "url": None,
                "redirect_from": redirect_from}

    fmt = imagebytes.guess_format(data)
    if fmt is None:
        return {"error": True}  # image.rs:387 — guess_format failure is an Err
    return {"ok": True, "bytes": data, "format": fmt, "url": image_url_final,
            "redirect_from": redirect_from}


def scrape_images(candidates: list[CandidateButton], images_get, cache_get,
                  now, button_ttl_hours: int = 24 * 7) -> list[ButtonData | None]:
    """image.rs:26-65 — per-page candidate loop with rotation + abort budget.

    ``cache_get(url) -> (hash, file_ext, last_visited) | None``.
    Returns a list aligned to ``candidates`` (None = not an 88x31).
    """
    from datetime import timedelta

    results: list[ButtonData | None] = [None] * len(candidates)
    valid = 0
    scraped = 0
    for i in candidate_scrape_order(len(candidates)):
        cand = candidates[i]
        scraped += 1
        btn = _scrape_one(cand, images_get, cache_get, now,
                          timedelta(hours=button_ttl_hours))
        if btn is not None:
            results[i] = btn
            valid += 1
        if scraped > 100 and valid == 0:
            break  # P8 — image.rs:58-61
    return results


def _scrape_one(cand: CandidateButton, images_get, cache_get, now, ttl):
    u = Url.parse(cand.src)
    if u is None:
        return None
    image_url = transform_image_url_clean(u)
    image_url_str = image_url.to_string()

    cached = cache_get(image_url_str)
    if cached is not None:
        c_hash, c_ext, c_last = cached
        if c_last + ttl > now:  # fresh (image.rs:78-82)
            return ButtonData(source=image_url_str, hash=c_hash, file_ext=c_ext,
                              target=cand.href, last_visited=c_last,
                              alt=cand.alt, title=cand.title)

    dl = download_88x31_image(image_url_str, images_get, now)
    if dl.get("error"):
        if cached is not None:  # stale-cache fallback (image.rs:108-125)
            c_hash, c_ext, c_last = cached
            return ButtonData(source=image_url_str, hash=c_hash, file_ext=c_ext,
                              target=cand.href, last_visited=c_last,
                              alt=cand.alt, title=cand.title)
        return None  # Err path — warn + skip (image.rs:53-55)

    data = dl["bytes"]
    fmt = dl["format"]
    if not data or fmt is None:
        return None
    if imagebytes.validate_image_size(data, fmt) is not True:
        return None  # False or undeterminable (image.rs:136-147)
    # X2 re-encode: canonical identity (hash pinned on source bytes; SURVEY §2 X2)
    h = imagebytes.hash_image(data)
    ext = imagebytes.format_extension(fmt)
    redirect_from = dl["redirect_from"]
    return ButtonData(source=dl["url"], hash=h, file_ext=ext, target=cand.href,
                      last_visited=now,
                      redirect_from=redirect_from,
                      redirect_last_visited=now if redirect_from else None,
                      alt=cand.alt, title=cand.title, fresh_bytes=bytes(data))
