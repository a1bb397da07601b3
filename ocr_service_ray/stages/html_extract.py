"""HTML main-content extraction: boilerplate strip + structured items.

The reference's entire "DOM heuristic" is flatten-everything —
``soup.get_text(" ", strip=True)`` then ``|``→space and whitespace
collapse (/root/reference/app/nfce_parser.py:99-101). Per the north rule
we build a real Readability-style main-content extractor from scratch on
the stdlib ``html.parser`` (bs4 is unavailable in-sandbox and unneeded):

1. tokenize the document, skipping the subtrees of chrome/boilerplate
   tags (``script style noscript nav header footer aside template``)
2. group visible text into blocks at block-element boundaries, tracking
   per-block link-character counts (text inside ``<a>``)
3. keep blocks whose link density (link chars / chars) is below a cutoff
   — the text-density scoring that kills link farms the tag filter
   misses — and emit them in document order, whitespace-normalized
   (``|``→space per the reference's flattener).

Structured extraction over the stripped text reimplements the
reference's regex semantics:
- item rows: ``desc (Código: c) ... Qtde.: q ... UN: u ... Vl. Unit.: vu
  ... Vl. Total vt`` (/root/reference/app/nfce_parser.py:97-134),
  tolerant of ``**`` markdown artifacts; qtd defaults 1.0; vu falls back
  to round(vt/qtd, 2); rows without vt are dropped
- date: ``Emissão: dd/mm/yyyy`` (/root/reference/app/nfce_parser.py:81-87)
- total: ``Valor a pagar R$: n`` (/root/reference/app/nfce_parser.py:89-95)
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import Any

from ..ops import textops as T

# Subtrees dropped wholesale (never contain main content).
DROP_TAGS = frozenset(
    {"script", "style", "noscript", "nav", "header", "footer", "aside", "template",
     "head", "title"}
)
# Elements that open/close a text block.
BLOCK_TAGS = frozenset(
    {
        "p", "div", "section", "article", "main", "body", "table", "tr", "td", "th",
        "ul", "ol", "li", "h1", "h2", "h3", "h4", "h5", "h6", "blockquote", "pre",
        "form", "figure", "figcaption", "br",
    }
)
# Void elements: never pushed on the stack (no matching end tag).
_VOID_TAGS = frozenset(
    {"br", "hr", "img", "input", "meta", "link", "area", "base", "col", "embed",
     "source", "track", "wbr"}
)

_WS = re.compile(r"\s+")

RE_HTML_ITEM = re.compile(
    r"(?P<desc>[^()]*?)\s*\(\s*C[óo]digo[:\s]*(?P<code>\d+)\s*\)\s*"
    r".*?Qtde\.?\s*:?\s*(?P<qtd>[\d.,]+)"
    r".*?UN\s*:?\s*(?P<un>[A-Za-z]{1,3})"
    r".*?Vl\.?\s*Unit\.?\s*:?\s*R?\$?\s*(?P<vu>[\d.,]+)"
    r".*?Vl\.?\s*Total\.?\s*:?\s*R?\$?\s*(?P<vt>[\d.,]+)",
    re.IGNORECASE,
)
RE_HTML_DATE = re.compile(r"Emiss[aã]o[:\s]*(\d{2}/\d{2}/\d{4})", re.IGNORECASE)
RE_HTML_TOTAL = re.compile(r"Valor\s+a\s+pagar\s+R?\$?\s*:?\s*([\d.,]+)", re.IGNORECASE)


class _BlockCollector(HTMLParser):
    """One pass: text blocks with (chars, link_chars) in document order."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple[str, int, int]] = []  # (text, chars, link_chars)
        self._drop_depth = 0
        self._link_depth = 0
        self._parts: list[str] = []
        self._link_chars = 0

    # -- block management ------------------------------------------------
    def _flush(self) -> None:
        text = _WS.sub(" ", "".join(self._parts)).strip()
        if text:
            self.blocks.append((text, len(text), self._link_chars))
        self._parts = []
        self._link_chars = 0

    # -- parser events ---------------------------------------------------
    def handle_starttag(self, tag: str, attrs: list) -> None:
        if tag in DROP_TAGS and tag not in _VOID_TAGS:
            self._drop_depth += 1
            return
        if self._drop_depth:
            return
        if tag in BLOCK_TAGS:
            self._flush()
        if tag == "a":
            self._link_depth += 1

    def handle_endtag(self, tag: str) -> None:
        if tag in DROP_TAGS and tag not in _VOID_TAGS:
            self._drop_depth = max(0, self._drop_depth - 1)
            return
        if self._drop_depth:
            return
        if tag in BLOCK_TAGS:
            self._flush()
        if tag == "a":
            self._link_depth = max(0, self._link_depth - 1)

    def handle_data(self, data: str) -> None:
        if self._drop_depth or not data:
            return
        self._parts.append(data)
        if self._link_depth:
            self._link_chars += len(data.strip())

    def close(self) -> None:  # noqa: D102 - flush trailing block
        super().close()
        self._flush()


def extract_main_text(
    html: str, max_link_density: float = 0.5, min_chars: int = 1
) -> str:
    """Boilerplate-stripped main text of an HTML document.

    Deterministic, never raises: a malformed document degrades to
    whatever blocks the tolerant stdlib parser recovers (mirroring the
    reference's never-fail flattener, app/nfce_parser.py:99-101).
    """
    parser = _BlockCollector()
    try:
        parser.feed(html or "")
        parser.close()
    except Exception:
        pass  # keep whatever blocks were collected before the error
    kept: list[str] = []
    for text, chars, link_chars in parser.blocks:
        if chars < min_chars:
            continue
        if chars > 0 and link_chars / chars > max_link_density:
            continue
        kept.append(text)
    flat = " ".join(kept).replace("|", " ")
    return _WS.sub(" ", flat).strip()


def extract_items_from_text(text: str) -> list[dict[str, Any]]:
    """Structured item rows from stripped text (nfce_parser.py:97-134)."""
    items: list[dict[str, Any]] = []
    cleaned = text.replace("**", " ")
    for m in RE_HTML_ITEM.finditer(cleaned):
        desc = T.clean_item_name(m.group("desc"))
        qtd = T.to_float(m.group("qtd"))
        if qtd is None:
            qtd = 1.0
        vt = T.to_float(m.group("vt"))
        if vt is None:
            continue
        vu = T.to_float(m.group("vu"))
        if vu is None and qtd > 0:
            vu = round(vt / qtd, 2)
        items.append(
            {
                "item": desc if desc else "ITEM DESCONHECIDO",
                "codigo": m.group("code"),
                "quantidade": float(qtd),
                "unidade": m.group("un").upper(),
                "valor_unitario": float(vu) if vu is not None else None,
                "valor_total": float(vt),
            }
        )
    return items


def extract_date_from_text(text: str) -> str | None:
    m = RE_HTML_DATE.search(text)
    return m.group(1) if m else None


def extract_total_from_text(text: str) -> float | None:
    m = RE_HTML_TOTAL.search(text)
    return T.to_float(m.group(1)) if m else None


def parse_html_document(html: str) -> dict[str, Any]:
    """Full HTML path: strip -> items/date/total (app/nfce_parser.py:48-65)."""
    text = extract_main_text(html)
    items = extract_items_from_text(text)
    return {
        "text": text,
        "itens": items,
        "data_compra": extract_date_from_text(text),
        "total_nota": extract_total_from_text(text),
        "confianca": 1.0 if items else 0.0,
    }
