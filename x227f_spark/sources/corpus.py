"""Deterministic synthetic crawl corpus (FIXTURES.md §1-§4).

Generates a seeded mini-web of interleaved text+media documents in the
BASELINE.json input_hint shape::

    documents(doc_id string, spans array<struct<kind,text,media_ref,offset>>)

plus the transport-layer tables the reference gets from HTTP (headers /
image bytes), which the input-hint schema deliberately does not carry:

    http(url, status, content_type, redirect_to, body_len)
    images(url, status, content_type, redirect_to, bytes, declared_len)

The same generator object feeds both the Spark engine (via parquet) and the
pure-Python golden model (in memory), so there is exactly one source of
truth for "the network".

Scale knobs: n_hosts / pages_per_host / a Zipf-ish mega-host for skew tests.
Every pathological case from the reference is represented (see FIXTURES.md
§1 knob list); cites inline.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field

from ..extract_logic import ImageResponse, pack_img_attrs
from .. import imagebytes


@dataclass
class Doc:
    status: int = 200
    content_type: str | None = "text/html"
    redirect_to: str | None = None
    body_len: int = 1000
    spans: list[tuple[str, str | None, str | None, int]] = field(default_factory=list)


@dataclass
class Corpus:
    docs: dict[str, Doc] = field(default_factory=dict)
    images: dict[str, ImageResponse] = field(default_factory=dict)
    seed_url: str = "https://site0.example/"

    # -- lookups used by the golden model --------------------------------
    def http_get(self, url: str) -> Doc | None:
        return self.docs.get(url)

    def images_get(self, url: str) -> ImageResponse | None:
        return self.images.get(url)


class _SpanBuilder:
    def __init__(self):
        self.spans: list[tuple[str, str | None, str | None, int]] = []

    def text(self, t: str):
        self.spans.append(("text", t, None, len(self.spans)))

    def anchor(self, href: str):
        self.spans.append(("anchor", href, None, len(self.spans)))

    def img(self, src: str, alt="", title="", width="", height=""):
        self.spans.append(("img", pack_img_attrs(alt, title, width, height), src,
                           len(self.spans)))

    def linked_img(self, href: str, src: str, alt="", title="", width="", height=""):
        """<a href><img></a> — anchor span immediately followed by img span."""
        self.anchor(href)
        self.img(src, alt, title, width, height)


def generate(n_hosts: int = 8, pages_per_host: int = 4, n_buttons: int = 12,
             seed: int = 42, mega_host_pages: int = 0,
             edge_cases: bool = True, seed_button_fanout: int = 0,
             buttons_per_page: tuple[int, int] = (2, 4),
             filler_text_spans: int = 0) -> Corpus:
    """Build the corpus. ``n_hosts * pages_per_host`` regular pages plus a
    button pool plus (optionally) every reference edge case.

    Bench knobs: ``seed_button_fanout`` adds seed-page buttons to the first
    K hosts (fast frontier ramp-up); ``buttons_per_page`` scales per-page
    image-candidate work; ``filler_text_spans`` pads span counts."""
    rng = random.Random(seed)
    corpus = Corpus()

    hosts = [f"site{i}.example" for i in range(n_hosts)]
    pages = {h: [f"https://{h}/" if j == 0 else f"https://{h}/page{j}.html"
                 for j in range(pages_per_host)] for h in hosts}
    if mega_host_pages > 0:
        mh = "mega.example"
        hosts.append(mh)
        pages[mh] = [f"https://{mh}/p{j}" for j in range(mega_host_pages)]

    # ---- button image pool ---------------------------------------------
    fmts = ["png", "gif", "bmp", "jpeg"]
    button_urls: list[str] = []
    for k in range(n_buttons):
        fmt = fmts[k % len(fmts)]
        ext = imagebytes.format_extension(fmt)
        url = f"https://buttons.example/b{k}.{ext}"
        data = imagebytes.make_image(fmt, 88, 31, seed=seed * 1000 + k)
        corpus.images[url] = ImageResponse(status=200, content_type=f"image/{fmt}",
                                           data=data)
        button_urls.append(url)

    if edge_cases:
        # decoy: wrong dimensions (image.rs:530-536)
        corpus.images["https://buttons.example/decoy.png"] = ImageResponse(
            status=200, content_type="image/png",
            data=imagebytes.make_image("png", 100, 50, seed=seed))
        # undecodable blob → guess_format Err (image.rs:387)
        corpus.images["https://buttons.example/garbage.png"] = ImageResponse(
            status=200, content_type="image/png", data=b"not an image at all....")
        # oversize image (image.rs:371-379)
        corpus.images["https://buttons.example/huge.png"] = ImageResponse(
            status=200, content_type="image/png",
            data=imagebytes.make_image("png", 88, 31, seed=seed + 7),
            declared_len=11 * 1024 * 1024)
        # wrong content-type (image.rs:354-359)
        corpus.images["https://buttons.example/nota.png"] = ImageResponse(
            status=200, content_type="text/plain",
            data=imagebytes.make_image("png", 88, 31, seed=seed + 8))
        # redirecting image (image.rs:296-318)
        corpus.images["https://buttons.example/moved.gif"] = ImageResponse(
            status=302, redirect_to="https://buttons.example/b1.gif")
        # redirect loop
        corpus.images["https://buttons.example/loop_a.gif"] = ImageResponse(
            status=302, redirect_to="https://buttons.example/loop_b.gif")
        corpus.images["https://buttons.example/loop_b.gif"] = ImageResponse(
            status=302, redirect_to="https://buttons.example/loop_a.gif")
        # error status image
        corpus.images["https://buttons.example/gone.png"] = ImageResponse(
            status=404, content_type="text/html", data=b"")

    # data: URI button (S7 — image.rs:420-454): a real 88x31 BMP
    data_bmp = imagebytes.make_image("bmp", 88, 31, seed=seed + 9)
    import base64 as _b64
    data_uri = "data:image/bmp;base64," + _b64.b64encode(data_bmp).decode()

    # ---- regular pages ---------------------------------------------------
    all_page_urls = [u for h in hosts for u in pages[h]]
    for h in hosts:
        for j, url in enumerate(pages[h]):
            b = _SpanBuilder()
            b.text(f"welcome to {h} page {j}")
            # internal links: next pages on same host (relative + absolute mix)
            for t in range(1, pages_per_host if h != "mega.example" else 4):
                target = pages[h][(j + t) % len(pages[h])]
                if target != url:
                    if rng.random() < 0.5:
                        b.anchor(target)
                    else:
                        b.anchor("/" + target.split("/", 3)[3] if target.count("/") >= 3
                                 and target.split("/", 3)[3] else target)
            for _f in range(filler_text_spans):
                b.text(f"filler {rng.randint(0, 10 ** 9)} lorem ipsum "
                       f"{rng.random():.6f}")
            # cross-host buttons: linked 88x31s
            nb = rng.randint(*buttons_per_page)
            for _ in range(nb):
                tgt_host = rng.choice(hosts)
                tgt = rng.choice(pages[tgt_host])
                src = rng.choice(button_urls)
                b.text("check this site:")
                b.linked_img(tgt, src, alt=f"button for {tgt_host}",
                             width="88", height="31")
            # an unlinked button (no anchor)
            if rng.random() < 0.5:
                b.img(rng.choice(button_urls), alt="unlinked")
            b.text("bye")
            corpus.docs[url] = Doc(spans=b.spans)

    if edge_cases:
        _add_edge_case_pages(corpus, hosts, pages, button_urls, data_uri, rng)

    corpus.seed_url = pages[hosts[0]][0]

    if seed_button_fanout > 0:
        seed_doc = corpus.docs[corpus.seed_url]
        sb = _SpanBuilder()
        sb.spans = list(seed_doc.spans)
        for k, h in enumerate(hosts[:seed_button_fanout]):
            sb.linked_img(pages[h][0], button_urls[k % len(button_urls)],
                          alt=f"directory {h}", width="88", height="31")
        sb.spans = [(kk, t, m, i) for i, (kk, t, m, _) in enumerate(sb.spans)]
        seed_doc.spans = sb.spans
    return corpus


def _add_edge_case_pages(corpus: Corpus, hosts, pages, button_urls, data_uri, rng):
    """Pages hitting every list/filter in the reference (cites inline)."""
    h0 = hosts[0]
    root = pages[h0][0]

    # hub page linked from the seed exercising the weird cases
    b = _SpanBuilder()
    b.text("edge case hub")
    # tracking params (page.rs:303-317, main.rs:44)
    b.anchor(f"https://{h0}/page1.html?ref=tracker&keep=1")
    # fragment + port stripping (page.rs:338-343)
    b.anchor(f"https://{h0}:443/page2.html#section")
    # youtube rewrites (page.rs:320-335)
    b.anchor("https://www.youtube.com/watch?v=abc123&t=5s")
    b.anchor("https://youtu.be/xyz789")
    # invalid first char (page.rs:230) / bad scheme (page.rs:238) / too long (page.rs:241)
    b.anchor("#fragment-only")
    b.anchor("mailto:someone@example.com")
    b.anchor("https://" + h0 + "/" + "x" * 300)
    # banned + no-follow hosts (main.rs:47-58)
    b.anchor("https://prlog.ru/spam")
    b.anchor("https://sub.web.archive.org/web/foo")
    b.anchor("https://phoenix-search.jp/")
    # www + index.html PageId collapsing (data.rs:534-552)
    b.anchor(f"https://www.{h0}/page3.html")
    b.anchor(f"https://{h0}/dir/index.html")
    # self link (main.rs:290-292)
    b.anchor(f"https://{h0}/hub.html")
    # duplicate img srcs — first wins (page.rs:203-206)
    b.img(button_urls[0], alt="first occurrence", width="88", height="31")
    b.img(button_urls[0], alt="second occurrence ignored")
    # img with bad dims attr (page.rs:180-200) and svg/ico paths
    b.img(button_urls[1], width="100", height="31")
    b.img("https://buttons.example/icon.svg")
    b.img("https://buttons.example/favicon.ico")
    # decoys and failures
    b.linked_img(f"https://{hosts[1]}/", "https://buttons.example/decoy.png")
    b.img("https://buttons.example/garbage.png")
    b.img("https://buttons.example/huge.png")
    b.img("https://buttons.example/nota.png")
    b.img("https://buttons.example/moved.gif", alt="redirected button")
    b.img("https://buttons.example/loop_a.gif")
    b.img("https://buttons.example/gone.png")
    # data: URI button (image.rs:420-454)
    b.img(data_uri, alt="inline button")
    # anchor whose href equals the img src → not a page link (page.rs:278-280)
    b.linked_img(button_urls[2], button_urls[2], alt="self-linked img",
                 width="88", height="31")
    corpus.docs[f"https://{h0}/hub.html"] = Doc(spans=b.spans)

    # make the seed link to the hub and special docs via *buttons* (weight
    # 1.0, data.rs:392-401) so they pass the 0.151 admission threshold —
    # plain internal anchors (weight 0.02) never do from a 0.15-score seed.
    seed_doc = corpus.docs[root]
    sb = _SpanBuilder()
    sb.spans = list(seed_doc.spans)
    for n, extra in enumerate(("hub.html", "redir.html", "plain.txt",
                               "missing.html", "error500.html",
                               "dir/index.html", "page1.html")):
        sb.linked_img(f"https://{h0}/{extra}", button_urls[n % len(button_urls)],
                      alt=f"seed button {n}", width="88", height="31")
    # re-number offsets
    sb.spans = [(k, t, m, i) for i, (k, t, m, _) in enumerate(sb.spans)]
    seed_doc.spans = sb.spans

    # redirect-only page (page.rs:28-39)
    corpus.docs[f"https://{h0}/redir.html"] = Doc(
        status=301, redirect_to=f"https://{hosts[1]}/", spans=[])
    # redirect with same PageId → P6 basic-redirect retry (page.rs:128-137)
    corpus.docs[f"https://{h0}/dir/index.html"] = Doc(
        status=301, redirect_to=f"https://www.{h0}/dir/", spans=[])
    corpus.docs[f"https://www.{h0}/dir/"] = Doc(spans=_SpanBuilder().spans)
    # non-html page (page.rs:64-66) — content-type gate → scrape error → P4
    corpus.docs[f"https://{h0}/plain.txt"] = Doc(
        content_type="text/plain", spans=[])
    # error-status page (page.rs:40-50) — empty page, failed=0
    corpus.docs[f"https://{h0}/error500.html"] = Doc(status=500, spans=[])
    # page3 exists only via www-link; make it real
    corpus.docs[f"https://www.{h0}/page3.html"] = Doc(spans=_SpanBuilder().spans)
    # capstasher archive host — internal weight 1.0 (data.rs:370-376)
    cb = _SpanBuilder()
    cb.text("capstasher archive")
    for j in range(3):
        cb.anchor(f"https://capstasher.neocities.org/p{j}")
    cb.linked_img(f"https://{hosts[1]}/", button_urls[3], width="88", height="31")
    corpus.docs["https://capstasher.neocities.org/"] = Doc(spans=cb.spans)
    for j in range(3):
        corpus.docs[f"https://capstasher.neocities.org/p{j}"] = Doc(
            spans=_SpanBuilder().spans)
    # link capstasher + a slow host (10s politeness, ratelimiter.rs:39-49)
    # from the hub via buttons — cross-host plain anchors produce no edges
    # in the reference (data.rs:354-416), so buttons are the only way these
    # get admitted.
    hub = corpus.docs[f"https://{h0}/hub.html"]
    hb = _SpanBuilder(); hb.spans = list(hub.spans)
    hb.linked_img("https://capstasher.neocities.org/", button_urls[4],
                  alt="capstasher", width="88", height="31")
    hb.linked_img("https://forum.jcink.net/board", button_urls[5],
                  alt="jcink forum", width="88", height="31")
    hb.spans = [(k, t, m, i) for i, (k, t, m, _) in enumerate(hb.spans)]
    hub.spans = hb.spans
    corpus.docs["https://forum.jcink.net/board"] = Doc(spans=_SpanBuilder().spans)
    # "missing.html" intentionally absent → download error → P4 backoff


# ---------------------------------------------------------------------------
# Parquet writers (pyarrow; deterministic row order)
# ---------------------------------------------------------------------------

def write_parquet(corpus: Corpus, out_dir: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq
    import os

    os.makedirs(out_dir, exist_ok=True)

    span_type = pa.list_(pa.struct([
        ("kind", pa.string()), ("text", pa.string()),
        ("media_ref", pa.string()), ("offset", pa.int32()),
    ]))
    doc_ids = sorted(corpus.docs)
    docs_tbl = pa.table({
        "doc_id": pa.array(doc_ids, pa.string()),
        "spans": pa.array(
            [[{"kind": k, "text": t, "media_ref": m, "offset": o}
              for (k, t, m, o) in corpus.docs[d].spans] for d in doc_ids],
            span_type),
    })
    pq.write_table(docs_tbl, os.path.join(out_dir, "documents.parquet"))

    http_tbl = pa.table({
        "url": pa.array(doc_ids, pa.string()),
        "status": pa.array([corpus.docs[d].status for d in doc_ids], pa.int32()),
        "content_type": pa.array([corpus.docs[d].content_type for d in doc_ids],
                                 pa.string()),
        "redirect_to": pa.array([corpus.docs[d].redirect_to for d in doc_ids],
                                pa.string()),
        "body_len": pa.array([corpus.docs[d].body_len for d in doc_ids], pa.int64()),
    })
    pq.write_table(http_tbl, os.path.join(out_dir, "http.parquet"))

    img_urls = sorted(corpus.images)
    images_tbl = pa.table({
        "url": pa.array(img_urls, pa.string()),
        "status": pa.array([corpus.images[u].status for u in img_urls], pa.int32()),
        "content_type": pa.array([corpus.images[u].content_type for u in img_urls],
                                 pa.string()),
        "redirect_to": pa.array([corpus.images[u].redirect_to for u in img_urls],
                                pa.string()),
        "bytes": pa.array([corpus.images[u].data for u in img_urls], pa.binary()),
        "declared_len": pa.array([corpus.images[u].declared_len for u in img_urls],
                                 pa.int64()),
    })
    pq.write_table(images_tbl, os.path.join(out_dir, "images.parquet"))
