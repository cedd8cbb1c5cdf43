"""HTML main-content extraction: DOM block segmentation + boilerplate strip.

The north_star requires text spans (raw HTML/text bytes) to pass through a
vectorized stage that tokenizes the markup, strips boilerplate via DOM-tree
heuristics (tag-density and link-ratio scoring), and classifies content vs
chrome. The reference never parses HTML (its text path is OCR raw_text,
reference backend/services/ocr_service.py:109-113), so these semantics are
ours — defined once here, imported by both the single-node oracle and the
Arrow UDF stage so parity is structural.

Pure stdlib (html.parser); no per-row Python on the Spark side — the UDF
wraps :func:`extract_main_text` over Arrow batches.
"""
from __future__ import annotations

import re
from dataclasses import dataclass, field
from html.parser import HTMLParser
from typing import List

from ..constants import (
    BP_BLOCK_TAGS,
    BP_CHROME_TAGS,
    BP_LINK_RATIO_MAX,
    BP_MIN_TEXT_LEN,
    BP_TAG_DENSITY_MAX,
)

_WS_RE = re.compile(r"[ \t\r\f\v]+")
_WORD_RE = re.compile(r"\S+")


@dataclass
class Block:
    """One flat DOM block with boilerplate-scoring features."""

    texts: List[str] = field(default_factory=list)
    link_texts: List[str] = field(default_factory=list)
    tag_count: int = 0
    in_chrome: bool = False

    @property
    def text(self) -> str:
        return _WS_RE.sub(" ", "".join(self.texts)).strip()

    @property
    def link_text(self) -> str:
        return "".join(self.link_texts)

    def word_count(self) -> int:
        return len(_WORD_RE.findall(self.text))

    def link_ratio(self) -> float:
        t = len(self.text)
        return (len(self.link_text.strip()) / t) if t else 1.0

    def tag_density(self) -> float:
        w = self.word_count()
        return (self.tag_count / w) if w else float(self.tag_count)

    def is_content(self) -> bool:
        if self.in_chrome:
            return False
        if len(self.text) < BP_MIN_TEXT_LEN:
            return False
        if self.link_ratio() > BP_LINK_RATIO_MAX:
            return False
        if self.tag_density() > BP_TAG_DENSITY_MAX:
            return False
        return True


class _BlockParser(HTMLParser):
    """Flatten HTML into block-tag-delimited Blocks with link/tag features."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: List[Block] = [Block()]
        self._chrome_depth = 0
        self._link_depth = 0
        self._skip_depth = 0  # inside <script>/<style>

    def _new_block(self) -> None:
        if self.blocks[-1].texts or self.blocks[-1].tag_count:
            self.blocks.append(Block(in_chrome=self._chrome_depth > 0))
        else:
            self.blocks[-1].in_chrome = self._chrome_depth > 0

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in ("script", "style"):
            self._skip_depth += 1
        if tag in BP_CHROME_TAGS and tag not in ("script", "style"):
            self._chrome_depth += 1
        if tag in BP_BLOCK_TAGS:
            self._new_block()
        else:
            self.blocks[-1].tag_count += 1
        if tag == "a":
            self._link_depth += 1

    def handle_endtag(self, tag: str) -> None:
        if tag in ("script", "style") and self._skip_depth > 0:
            self._skip_depth -= 1
        if tag in BP_CHROME_TAGS and tag not in ("script", "style"):
            self._chrome_depth = max(0, self._chrome_depth - 1)
        if tag == "a":
            self._link_depth = max(0, self._link_depth - 1)
        if tag in BP_BLOCK_TAGS:
            self._new_block()

    def handle_data(self, data: str) -> None:
        if self._skip_depth:
            return
        self.blocks[-1].texts.append(data)
        if self._link_depth:
            self.blocks[-1].link_texts.append(data)


def segment_blocks(html: str) -> List[Block]:
    """Parse HTML (or plain text) into scored blocks. Plain text (no tags)
    yields one block per line so downstream line semantics survive."""
    if "<" not in html:
        return [Block(texts=[line]) for line in html.split("\n")]
    p = _BlockParser()
    try:
        p.feed(html)
        p.close()
    except Exception:
        # Malformed markup: degrade to tag-stripped text, one block.
        stripped = re.sub(r"<[^>]*>", " ", html)
        return [Block(texts=[stripped])]
    return p.blocks


def extract_main_text(html: str) -> str:
    """Boilerplate-stripped main content: newline-joined content blocks.

    This is the per-span output text for kind='text' spans (the engine's
    analog of the reference's per-page raw_text, ocr_service.py:110).
    """
    if html is None:
        return ""
    blocks = segment_blocks(html)
    return "\n".join(b.text for b in blocks if b.is_content())


def classify_blocks(html: str) -> List[dict]:
    """Content-vs-chrome classification with features, for diagnostics."""
    out = []
    for i, b in enumerate(segment_blocks(html)):
        out.append(
            {
                "block_idx": i,
                "text": b.text,
                "link_ratio": round(b.link_ratio(), 6),
                "tag_density": round(b.tag_density(), 6),
                "in_chrome": b.in_chrome,
                "is_content": b.is_content(),
            }
        )
    return out
