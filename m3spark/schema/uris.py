"""URI resolution for $id/$ref scoping.

From-scratch equivalent of the reference's URI layer
(m3: src/cljc/m3/uri.cljc:22-104 parse/inherit, src/cljc/m3/ref.cljc:46-115
canonicalise/resolve).  Built on ``urllib.parse`` with a special case for
non-hierarchical schemes (``urn:``), which ``urljoin`` mishandles.
"""

from __future__ import annotations

from functools import lru_cache
from urllib.parse import urldefrag, urljoin, urlsplit, unquote


def split_fragment(uri: str) -> tuple[str, str | None]:
    """Return (uri-without-fragment, fragment-or-None). '' fragment kept as ''."""
    if "#" in uri:
        base, frag = uri.split("#", 1)
        return base, frag
    return uri, None


@lru_cache(maxsize=4096)
def resolve_uri(base: str, ref: str) -> str:
    """Resolve ``ref`` against ``base`` per RFC 3986, preserving fragments."""
    if not base:
        return ref
    if ref.startswith("#"):
        root, _ = urldefrag(base)
        return root + ref
    scheme = urlsplit(base).scheme
    if scheme and scheme not in ("http", "https", "file", "ftp"):
        # non-hierarchical (urn:...): relative refs replace the fragment only
        ref_scheme = urlsplit(ref).scheme
        if ref_scheme:
            return ref
        root, _ = urldefrag(base)
        return root + "#" + split_fragment(ref)[1] if "#" in ref else ref
    return urljoin(base, ref)


def pointer_unescape(token: str) -> str:
    """RFC 6901 token unescape: ~1 -> /, ~0 -> ~ (order matters)."""
    return token.replace("~1", "/").replace("~0", "~")


def pointer_escape(token: str) -> str:
    return token.replace("~", "~0").replace("/", "~1")


def pointer_tokens(pointer: str) -> list[str]:
    """Split a JSON pointer ('' or '/a/b/0') into unescaped tokens."""
    if pointer in ("", "/"):
        return [] if pointer == "" else [""]
    if not pointer.startswith("/"):
        raise ValueError(f"invalid JSON pointer: {pointer!r}")
    return [pointer_unescape(unquote(t)) for t in pointer.split("/")[1:]]


def pointer_get(doc, pointer: str):
    """Descend ``doc`` by JSON pointer; raises KeyError/IndexError on miss."""
    cur = doc
    for tok in pointer_tokens(pointer):
        if isinstance(cur, dict):
            cur = cur[tok]
        elif isinstance(cur, list):
            cur = cur[int(tok)]
        else:
            raise KeyError(f"cannot descend {tok!r} into {type(cur).__name__}")
    return cur


def join_pointer(base: str, *tokens) -> str:
    """Append tokens to a JSON pointer string."""
    out = base
    for t in tokens:
        out += "/" + pointer_escape(str(t))
    return out
