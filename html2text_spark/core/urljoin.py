"""URL joining with the reference's exact semantics.

Parity target: /root/reference/src/Utilities/UrlUtilities.php:9-135.
Notable divergences from RFC 3986 / urllib.parse.urljoin that the golden
fixtures depend on (url_utilities_coverage*):
  * a relative link with no query inherits the base URL's query string;
  * duplicate slashes are collapsed by dot-segment normalization;
  * '..' segments above the root are silently dropped;
  * an unparseable base (no scheme and no host) raises ValueError -- the
    pipeline maps that to ``metrics.malformed`` instead of failing the job.
"""

from __future__ import annotations

import re
from urllib.parse import urlsplit

_RE_ABSOLUTE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*://")


class InvalidBaseUrl(ValueError):
    pass


def _split_base(base: str) -> dict:
    try:
        parts = urlsplit(base)
    except ValueError as exc:  # e.g. invalid IPv6 literal
        raise InvalidBaseUrl("Invalid base URL") from exc
    result = {
        "scheme": parts.scheme or "",
        "host": parts.hostname or "",
        "port": parts.port,
        "user": parts.username,
        "password": parts.password,
        "path": parts.path,
        "query": parts.query,
        "fragment": parts.fragment,
    }
    if not result["scheme"] and not result["host"]:
        raise InvalidBaseUrl("Invalid base URL")
    return result


def normalize_path(path: str) -> str:
    """Collapse '.'/'..'/duplicate-slash segments, keeping edge slashes."""
    leading = path.startswith("/")
    trailing = path.endswith("/")
    output: list = []
    for segment in path.split("/"):
        if segment in ("", "."):
            continue
        if segment == "..":
            if output:
                output.pop()
            continue
        output.append(segment)
    normalized = "/".join(output)
    if leading:
        normalized = "/" + normalized
    if trailing and normalized != "/":
        normalized += "/"
    return normalized


def _build(parts: dict, path: str) -> str:
    scheme = parts["scheme"]
    host = parts["host"]
    port = ":" + str(parts["port"]) if parts["port"] is not None else ""
    auth = ""
    if parts["user"] is not None:
        auth = parts["user"]
        if parts["password"] is not None:
            auth += ":" + parts["password"]
        auth += "@"
    authority = auth + host + port
    return (scheme + "://" if scheme else "") + authority + path


def url_join(base: str, link: str) -> str:
    """Join ``link`` against ``base`` (see module docstring for semantics)."""
    if link == "":
        return base
    if base == "":
        return link
    if _RE_ABSOLUTE.match(link):
        return link

    base_parts = _split_base(base)

    if link[0] == "#":
        base_no_fragment = base.split("#", 1)[0]
        return base_no_fragment + link

    if link[0] == "?":
        path = base_parts["path"] or "/"
        return _build(base_parts, path + link)

    if link.startswith("//"):
        scheme = base_parts["scheme"]
        return (scheme + ":" if scheme else "") + link

    fragment = ""
    hash_pos = link.find("#")
    if hash_pos != -1:
        fragment = link[hash_pos:]
        link = link[:hash_pos]

    query = ""
    query_pos = link.find("?")
    if query_pos != -1:
        query = link[query_pos:]
        link = link[:query_pos]

    if link.startswith("/"):
        path = normalize_path(link)
    else:
        base_path = base_parts["path"] or "/"
        directory = base_path
        if not directory.endswith("/"):
            last_slash = directory.rfind("/")
            directory = directory[: last_slash + 1] if last_slash != -1 else "/"
        path = normalize_path(directory + link)

    if not query and base_parts["query"]:
        query = "?" + base_parts["query"]

    return _build(base_parts, path + query + fragment)
