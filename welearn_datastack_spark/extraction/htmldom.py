"""Minimal stdlib HTML DOM for scraper extraction plugins.

The reference's scrapers walk real-world pages with BeautifulSoup's
``html.parser`` tree builder; this module rebuilds the subset of that
API the plugins use — ``find``/``find_all`` with attribute filters
(class matched as a token), ``.text``, ``decompose``,
``replace_with`` — directly on :mod:`html.parser`, so the extraction
runs inside pandas UDFs with no third-party dependency. Semantics
follow bs4's html.parser builder: no implied-close repair, void
elements never take children, ``.text`` is plain concatenation of
descendant strings in document order.
"""

from __future__ import annotations

from html import unescape
from html.parser import HTMLParser
from typing import Any, Iterator

_VOID = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}


class Node:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str | None, attrs: dict[str, str] | None = None):
        self.tag = tag  # None → text node (attrs["_text"])
        self.attrs: dict[str, Any] = attrs or {}
        self.children: list[Node] = []
        self.parent: Node | None = None

    # -- tree walk ---------------------------------------------------
    def iter(self) -> Iterator["Node"]:
        yield self
        for c in list(self.children):
            yield from c.iter()

    @property
    def text(self) -> str:
        """bs4 ``.text``: descendant strings concatenated, no joins."""
        if self.tag is None:
            return self.attrs.get("_text", "")
        return "".join(c.text for c in self.children)

    def get_text(self) -> str:
        return self.text

    def get(self, attr: str, default: Any = None) -> Any:
        return self.attrs.get(attr, default)

    # -- queries -----------------------------------------------------
    def _matches(self, tag: str | list[str] | None, attrs: dict | None) -> bool:
        if self.tag is None:
            return False
        if tag is not None:
            tags = [tag] if isinstance(tag, str) else list(tag)
            if self.tag not in tags:
                return False
        for k, v in (attrs or {}).items():
            mine = self.attrs.get(k)
            if mine is None:
                return False
            wanted = v if isinstance(v, list) else [v]
            if k == "class":
                tokens = str(mine).split()
                if not any(w in tokens for w in wanted):
                    return False
            elif str(mine) not in [str(w) for w in wanted]:
                return False
        return True

    def find_all(
        self, tag: str | list[str] | None = None, attrs: dict | None = None
    ) -> list["Node"]:
        return [n for n in self.iter() if n is not self and n._matches(tag, attrs)]

    def find(
        self, tag: str | list[str] | None = None, attrs: dict | None = None
    ) -> "Node | None":
        for n in self.iter():
            if n is not self and n._matches(tag, attrs):
                return n
        return None

    # -- mutation ----------------------------------------------------
    def decompose(self) -> None:
        if self.parent is not None:
            self.parent.children.remove(self)
            self.parent = None

    def replace_with_text(self, text: str) -> None:
        """Swap this node for a plain text node (the reference's
        ``figure.replace_with(soup_of_paragraph)`` shape)."""
        if self.parent is None:
            return
        tn = Node(None, {"_text": text})
        tn.parent = self.parent
        idx = self.parent.children.index(self)
        self.parent.children[idx] = tn
        self.parent = None


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node("[document]")
        self.stack = [self.root]

    def handle_starttag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        node = Node(tag, {k: (unescape(v) if v else "") for k, v in attrs})
        node.parent = self.stack[-1]
        self.stack[-1].children.append(node)
        if tag not in _VOID:
            self.stack.append(node)

    def handle_startendtag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        node = Node(tag, {k: (unescape(v) if v else "") for k, v in attrs})
        node.parent = self.stack[-1]
        self.stack[-1].children.append(node)

    def handle_endtag(self, tag: str) -> None:
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
        # stray end tag: ignored (html.parser behavior)

    def handle_data(self, data: str) -> None:
        tn = Node(None, {"_text": data})
        tn.parent = self.stack[-1]
        self.stack[-1].children.append(tn)


def parse_html(text: str) -> Node:
    b = _TreeBuilder()
    b.feed(text)
    b.close()
    return b.root


def extract_property(
    node: Node | None,
    mandatory: bool = True,
    error_property_name: str | None = None,
    attribute_name: str = "content",
) -> str:
    """ref modules/scraping_utils.py:77-108
    ``extract_property_from_html``: attribute value if present, else
    the node's text; raise when mandatory and missing."""
    if node is None:
        if mandatory:
            raise ValueError(f"{error_property_name or 'Property'} not found")
        return ""
    if attribute_name in node.attrs:
        return str(node.attrs[attribute_name]).strip()
    return node.text.strip()
