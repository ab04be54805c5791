"""Minimal HTML DOM built on the stdlib ``html.parser``.

Stands in for the reference's ``scraper::Html`` parsed DOM
(``/root/reference/lib-lopez/src/directives/mod.rs:58-70``): the per-record
unit every rule set runs over. The DOM is parsed once per row inside the
analyze ``map_batches`` stage and all rules evaluate against it.

Only the Element surface the extractors need is implemented
(extractor.rs:77-123): name, attrs, classes, id, text nodes, inner/outer
HTML, parent, children, and CSS ``select`` over descendants.
"""

from __future__ import annotations

from html import escape
from html.parser import HTMLParser
from typing import Iterator, Optional

VOID_ELEMENTS = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}


class Element:
    __slots__ = ("name", "attrs", "parent", "children")

    def __init__(self, name: str, attrs: dict[str, str], parent: Optional["Element"]):
        self.name = name
        self.attrs = attrs
        self.parent = parent
        self.children: list = []  # Element | str (text node)

    # -- extractor protocol --

    def classes(self) -> list[str]:
        return self.attrs.get("class", "").split()

    def text_nodes(self) -> list[str]:
        out: list[str] = []
        stack = list(reversed(self.children))
        while stack:
            node = stack.pop()
            if isinstance(node, str):
                out.append(node)
            else:
                stack.extend(reversed(node.children))
        return out

    def parent_element(self) -> Optional["Element"]:
        p = self.parent
        return p if p is not None and p.name != "#document" else None

    def child_elements(self) -> list["Element"]:
        return [c for c in self.children if isinstance(c, Element)]

    def descendants(self) -> Iterator["Element"]:
        """Descendant elements in document order (excluding self)."""
        stack = list(reversed(self.child_elements()))
        while stack:
            el = stack.pop()
            yield el
            stack.extend(reversed(el.child_elements()))

    def select(self, selector) -> Iterator["Element"]:
        for el in self.descendants():
            if selector.matches(el):
                yield el

    def inner_html(self) -> str:
        return "".join(
            escape(c, quote=False) if isinstance(c, str) else c.outer_html()
            for c in self.children
        )

    def outer_html(self) -> str:
        attrs = "".join(f' {k}="{escape(v)}"' for k, v in self.attrs.items())
        if self.name in VOID_ELEMENTS:
            return f"<{self.name}{attrs}>"
        return f"<{self.name}{attrs}>{self.inner_html()}</{self.name}>"

    def __repr__(self) -> str:  # pragma: no cover
        return f"<Element {self.name} {self.attrs}>"


class Document(Element):
    """Root node; ``select`` covers the entire tree like scraper's
    ``Html::select``."""

    def __init__(self):
        super().__init__("#document", {}, None)


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Document()
        self.stack: list[Element] = [self.root]

    def handle_starttag(self, tag: str, attrs):
        attr_dict: dict[str, str] = {}
        for k, v in attrs:
            if k not in attr_dict:  # first occurrence wins (like html5 spec)
                attr_dict[k] = v if v is not None else ""
        el = Element(tag, attr_dict, self.stack[-1])
        self.stack[-1].children.append(el)
        if tag not in VOID_ELEMENTS:
            self.stack.append(el)

    def handle_startendtag(self, tag, attrs):
        attr_dict = {}
        for k, v in attrs:
            if k not in attr_dict:
                attr_dict[k] = v if v is not None else ""
        self.stack[-1].children.append(Element(tag, attr_dict, self.stack[-1]))

    def handle_endtag(self, tag: str):
        # Pop to the nearest matching open tag; tolerate stray end tags.
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].name == tag:
                del self.stack[i:]
                return

    def handle_data(self, data: str):
        if data:
            self.stack[-1].children.append(data)


def parse_html(text: str) -> Document:
    builder = _TreeBuilder()
    builder.feed(text)
    builder.close()
    return builder.root
