"""Pure-Python URL semantics shared by the Arrow UDF batch code and the
executable golden model (``x227f_spark.model``).

The reference uses the WHATWG ``url`` crate; we re-create the subset of its
behavior the crawl loop relies on with ``urllib.parse`` plus explicit
normalization (lowercase host, dot-segment removal, default-port dropping).
Reference cites:

- PageId normalization:      /root/reference/src/data.rs:534-552
- page-URL cleanup (U2):     /root/reference/src/scrape/page.rs:301-346
- image-URL cleanup (U3/U4): /root/reference/src/scrape/image.rs:457-506
- source_filename (U6):      /root/reference/src/data.rs:498-508
- host shortening (U7):      /root/reference/src/ratelimiter.rs:56-62

These functions are deliberately scalar: the vectorized layer
(`x227f_spark.functions.urlnorm`) maps them over Arrow batches inside
``pandas_udf`` bodies, which is where the per-batch amortization happens.
"""

from __future__ import annotations

from urllib.parse import (
    parse_qsl,
    quote,
    urlencode,
    urlsplit,
    urlunsplit,
)

_DEFAULT_PORTS = {"http": 80, "https": 443, "ws": 80, "wss": 443, "ftp": 21}

# WHATWG "special" schemes get path "/" when empty and dot-segment removal.
_SPECIAL = {"http", "https", "ws", "wss", "ftp", "file"}


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 — the WHATWG url crate applies this on parse."""
    if not path:
        return path
    output: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if len(output) > 1:
                output.pop()
            continue
        output.append(seg)
    # preserve a trailing slash implied by "." / ".." final segments
    if path.endswith(("/.", "/..")) and (not output or output[-1] != ""):
        output.append("")
    return "/".join(output)


class Url:
    """Minimal WHATWG-flavored parsed URL (scheme://host:port/path?q#f).

    Only what the crawl loop needs: http/https/data/mailto handling,
    canonical string form, join, query-pair access.
    """

    __slots__ = ("scheme", "host", "port", "path", "query", "fragment", "opaque")

    def __init__(self, scheme, host, port, path, query, fragment, opaque=None):
        self.scheme = scheme
        self.host = host
        self.port = port
        self.path = path
        self.query = query
        self.fragment = fragment
        # for non-hierarchical URLs (data:, mailto:) — everything after ':'
        self.opaque = opaque

    # -- parsing ---------------------------------------------------------
    @classmethod
    def parse(cls, s: str) -> "Url | None":
        s = s.strip()
        if not s:
            return None
        try:
            parts = urlsplit(s)
        except ValueError:
            return None
        scheme = parts.scheme.lower()
        if not scheme:
            return None  # relative — parse() only accepts absolute URLs
        if scheme in ("data", "mailto", "javascript", "tel"):
            rest = s[len(parts.scheme) + 1 :]
            return cls(scheme, "", None, "", "", "", opaque=rest)
        try:
            host = parts.hostname or ""
            port = parts.port
        except ValueError:
            return None
        if scheme in _SPECIAL and not host:
            return None  # http(s) URLs must have a host
        if port is not None and port == _DEFAULT_PORTS.get(scheme):
            port = None
        path = parts.path
        if scheme in _SPECIAL:
            path = _remove_dot_segments(path)
            if not path:
                path = "/"
        return cls(
            scheme,
            host,
            port,
            path,
            parts.query,
            parts.fragment,
        )

    # -- serialization ---------------------------------------------------
    def to_string(self) -> str:
        if self.opaque is not None:
            return f"{self.scheme}:{self.opaque}"
        netloc = self.host
        if self.port is not None:
            netloc = f"{netloc}:{self.port}"
        return urlunsplit((self.scheme, netloc, self.path, self.query, self.fragment))

    def __str__(self) -> str:  # pragma: no cover - convenience
        return self.to_string()

    def __eq__(self, other) -> bool:
        return isinstance(other, Url) and self.to_string() == other.to_string()

    def __hash__(self) -> int:
        return hash(self.to_string())

    def __repr__(self) -> str:  # pragma: no cover - debugging
        return f"Url({self.to_string()!r})"

    # -- operations ------------------------------------------------------
    def join(self, ref: str) -> "Url | None":
        """WHATWG-style join of a (possibly relative) reference."""
        ref = ref.strip()
        if self.opaque is not None:
            return Url.parse(ref)
        if ref == "":
            # url.join("") == base sans fragment
            out = self.copy()
            out.fragment = ""
            return out
        absolute = Url.parse(ref)
        if absolute is not None:
            return absolute
        try:
            parts = urlsplit(ref)
        except ValueError:
            return None
        out = self.copy()
        out.fragment = parts.fragment
        if parts.netloc:
            sub = Url.parse(f"{self.scheme}://{parts.netloc}{parts.path or '/'}")
            if sub is None:
                return None
            sub.query = parts.query
            sub.fragment = parts.fragment
            return sub
        if parts.path:
            if parts.path.startswith("/"):
                path = parts.path
            else:
                base_dir = self.path.rsplit("/", 1)[0]
                path = f"{base_dir}/{parts.path}"
            out.path = _remove_dot_segments(path) or "/"
            out.query = parts.query
        elif parts.query:
            out.query = parts.query
        return out

    def copy(self) -> "Url":
        return Url(
            self.scheme, self.host, self.port, self.path, self.query, self.fragment, self.opaque
        )

    def query_pairs(self) -> list[tuple[str, str]]:
        return parse_qsl(self.query, keep_blank_values=True)

    def set_query_pairs(self, pairs: list[tuple[str, str]]) -> None:
        self.query = urlencode(pairs) if pairs else ""


# ---------------------------------------------------------------------------
# U1 — PageId normalization (data.rs:534-552)
# ---------------------------------------------------------------------------

def page_id_from_url(url: "Url | str") -> tuple[str, str]:
    """URL → (host, path) exactly per data.rs:534-552.

    host: host_str (empty when hostless, e.g. mailto:) with every leading
    "www." repeat stripped. path: leading '/' runs stripped, trailing
    "/index.html" repeats stripped *before* trailing '/' runs.
    """
    if isinstance(url, str):
        parsed = Url.parse(url)
        if parsed is None:
            return ("", "")
        url = parsed
    host = url.host or ""
    while host.startswith("www."):
        host = host[4:]
    path = url.path
    path = path.lstrip("/")
    while path.endswith("/index.html"):
        path = path[: -len("/index.html")]
    path = path.rstrip("/")
    return (host, path)


def page_id_str(host: str, path: str) -> str:
    """PageId Display (data.rs:510-520): host + '/path' when path nonempty."""
    return f"{host}/{path}" if path else host


def page_id_of(url: "Url | str") -> str:
    host, path = page_id_from_url(url)
    return page_id_str(host, path)


# ---------------------------------------------------------------------------
# U2 — page-URL cleanup (page.rs:301-346); rule order matters for parity
# ---------------------------------------------------------------------------

def clean_page_url(url: Url, tracking_params=("ref", "si")) -> Url:
    url = url.copy()
    # 1. drop tracking params (page.rs:303-317)
    pairs = [(k, v) for (k, v) in url.query_pairs() if k not in tracking_params]
    url.set_query_pairs(pairs)
    # 2. www.youtube.com/watch → keep only v (page.rs:320-325)
    if url.host == "www.youtube.com" and url.path == "/watch":
        v = next((val for (k, val) in url.query_pairs() if k == "v"), None)
        if v is not None:
            url.set_query_pairs([("v", v)])
    # 3. youtu.be/x → www.youtube.com/watch?v=x (page.rs:328-335)
    if url.host == "youtu.be":
        segs = [s for s in url.path.split("/") if True]
        first = segs[1] if len(segs) > 1 else ""
        rewritten = Url.parse(
            "https://www.youtube.com/watch?" + urlencode([("v", first)])
        )
        if rewritten is not None:
            url = rewritten
    # 4. strip fragment (page.rs:338)
    url.fragment = ""
    # 5. strip port 80/443 (page.rs:341-343)
    if url.port in (80, 443):
        url.port = None
    return url


# ---------------------------------------------------------------------------
# U3/U4 — image-URL rewrites (image.rs:457-506)
# ---------------------------------------------------------------------------

def _host_matches(host: str, domain: str) -> bool:
    """F1 — main.rs:300-309: exact or dot-suffix match."""
    return host == domain or host.endswith("." + domain)


def hosts_list_contains(hosts: tuple[str, ...], host: str) -> bool:
    """main.rs:300-309 — suffix-list membership (includes subdomains)."""
    return any(_host_matches(host, d) for d in hosts)


def transform_image_url_clean(url: Url) -> Url:
    """U3 — image.rs:496-506: unwrap nextjs ``/_next/image?url=...``.

    Applied first (image.rs:73); the result is the cache key and stored
    button ``source``.
    """
    if url.path == "/_next/image":
        inner = next((v for (k, v) in url.query_pairs() if k == "url"), None)
        if inner is not None:
            unwrapped = url.join(inner)
            if unwrapped is not None:
                return unwrapped
    return url


def transform_image_url_bypass(url: Url) -> Url:
    """U4 — image.rs:457-492: rewrite blocked/dead hosts for fetching only.

    imgur → duckduckgo proxy; i*.tinypic.com / img*.imageshack.us /
    *.postimg.org / *.nickpic.host → oldest wayback snapshot.
    """
    host = url.host
    if not host:
        return url
    if host in ("i.imgur.com", "imgur.com"):
        wrapped = Url.parse(
            "https://proxy.duckduckgo.com/iu/?" + urlencode([("u", url.to_string())])
        )
        return wrapped if wrapped is not None else url
    is_dead_image_host = (
        ((host.startswith("i") or host.startswith("oi")) and host.endswith(".tinypic.com"))
        or (host.startswith("img") and host.endswith(".imageshack.us"))
        or host.endswith(".postimg.org")
        or host.endswith(".nickpic.host")
    )
    if is_dead_image_host:
        wrapped = Url.parse(f"https://web.archive.org/web/0if_/{url.to_string()}")
        return wrapped if wrapped is not None else url
    return url


# ---------------------------------------------------------------------------
# U6 — source_filename (data.rs:498-508)
# ---------------------------------------------------------------------------

def source_filename(source_url: str | None) -> str | None:
    if source_url is None:
        return None
    u = Url.parse(source_url)
    if u is None or u.opaque is not None:
        return None
    path = u.path.rstrip("/")
    filename = path.split("/")[-1] if path else ""
    return filename.split(".")[0]


# ---------------------------------------------------------------------------
# U7 — host shortening (ratelimiter.rs:56-62)
# ---------------------------------------------------------------------------

def shorten_host(host: str) -> str | None:
    parts = host.split(".")
    if len(parts) > 2:
        return ".".join(parts[1:])
    return None


def host_is_valid(host: str) -> bool:
    """F7 — page.rs:116-121: ascii alnum, '-', '.' only (and nonempty)."""
    return bool(host) and all(c.isascii() and (c.isalnum() or c in "-.") for c in host)
