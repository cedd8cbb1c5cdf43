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

import html as _html_mod
import re
from dataclasses import dataclass, field
from html.parser import HTMLParser
from typing import List, Optional

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

    # text/word_count are read 4-5x per block during scoring
    # (is_content -> link_ratio -> tag_density each re-derive them) and
    # ONLY read after parsing mutates `texts` — profiled at ~18% of
    # extract_main_text, so both memoize on first read.
    _text_cache: Optional[str] = field(default=None, repr=False,
                                       compare=False)
    _wc_cache: Optional[int] = field(default=None, repr=False,
                                     compare=False)

    @property
    def text(self) -> str:
        if self._text_cache is None:
            self._text_cache = _WS_RE.sub(" ", "".join(self.texts)).strip()
        return self._text_cache

    @property
    def link_text(self) -> str:
        return "".join(self.link_texts)

    def word_count(self) -> int:
        if self._wc_cache is None:
            self._wc_cache = len(_WORD_RE.findall(self.text))
        return self._wc_cache

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


# ---------------------------------------------------------------------------
# Fast tokenizer path
#
# html.parser is the semantic reference, but it is the single biggest Python
# CPU cost in the extraction hot path (~270 us/span measured). The regex
# tokenizer below produces BIT-IDENTICAL blocks for "simple" markup — every
# tag of the form <name ...> / </name> with quote-balanced attributes and no
# comments/doctypes/PIs — and returns None (caller falls back to HTMLParser)
# the moment anything outside that grammar appears, so parity with the
# reference path is structural, not probabilistic. ~2.2x faster end-to-end
# on the invoice corpus (property-tested equal in tests/test_textops_robust).
# ---------------------------------------------------------------------------

_TAG_SPLIT_RE = re.compile(r"<([a-zA-Z/][^<>]*)>")
# HTMLParser's tagfind_tolerant name charset: letter then anything except
# whitespace, '/', '>' or NUL — matching it exactly keeps names like
# 'div-foo' (NOT a block tag) from being misread as 'div'.
_TAG_NAME_RE = re.compile(r"^([a-zA-Z][^\t\n\r\f />\x00]*)")
_END_TAG_RE = re.compile(r"^/([a-zA-Z][^\t\n\r\f />\x00]*)\s*$")


def _quotes_balanced(body: str) -> bool:
    """True iff every quote opened in a tag body closes inside it. A '>'
    inside a quoted attribute value truncates the regex-matched body mid-
    quote, leaving an unclosed quote — detected here, forcing fallback."""
    i, n = 0, len(body)
    while i < n:
        c = body[i]
        if c in "\"'":
            j = body.find(c, i + 1)
            if j == -1:
                return False
            i = j + 1
        else:
            i += 1
    return True


def _segment_fast(html: str) -> Optional[List[Block]]:
    """Tokenize simple HTML into Blocks; None = needs the HTMLParser path."""
    if "<!" in html or "<?" in html:
        return None
    parts = _TAG_SPLIT_RE.split(html)  # [data, tagbody, data, tagbody, ...]
    blocks = [Block()]
    chrome = link = skip = 0

    def new_block() -> None:
        last = blocks[-1]
        if last.texts or last.tag_count:
            blocks.append(Block(in_chrome=chrome > 0))
        else:
            last.in_chrome = chrome > 0

    for i, seg in enumerate(parts):
        if i % 2 == 0:  # data segment
            if not seg:
                continue
            if "<" in seg:
                return None  # markup the tag regex couldn't consume
            if skip:
                continue
            if "&" in seg:
                seg = _html_mod.unescape(seg)
            blocks[-1].texts.append(seg)
            if link:
                blocks[-1].link_texts.append(seg)
            continue
        # tag body
        if seg.startswith("/"):
            m = _END_TAG_RE.match(seg)
            if not m:
                return None
            tag, events = m.group(1).lower(), ("end",)
        else:
            m = _TAG_NAME_RE.match(seg)
            if not m:
                return None
            tag = m.group(1).lower()
            rest = seg[m.end():]
            if rest and not rest[0].isspace() and rest != "/":
                return None  # junk glued to the name — let HTMLParser decide
            if not _quotes_balanced(rest):
                return None
            if rest == "/" or (
                    rest.endswith("/") and rest[-2] in " \t\n\r\f\"'"):
                events = ("start", "end")  # <br/> = startendtag
            elif rest.rstrip().endswith("/"):
                # e.g. <a href=/x/> — HTMLParser folds the '/' into the
                # unquoted attr value; ambiguous, let it decide.
                return None
            else:
                events = ("start",)
        for ev in events:
            if ev == "start":
                if tag in ("script", "style"):
                    skip += 1
                if tag in BP_CHROME_TAGS and tag not in ("script", "style"):
                    chrome += 1
                if tag in BP_BLOCK_TAGS:
                    new_block()
                else:
                    blocks[-1].tag_count += 1
                if tag == "a":
                    link += 1
            else:
                if tag in ("script", "style") and skip > 0:
                    skip -= 1
                if tag in BP_CHROME_TAGS and tag not in ("script", "style"):
                    chrome = max(0, chrome - 1)
                if tag == "a":
                    link = max(0, link - 1)
                if tag in BP_BLOCK_TAGS:
                    new_block()
    return blocks


def segment_blocks(html: str) -> List[Block]:
    """Parse HTML (or plain text) into scored blocks. Plain text (no tags)
    yields one block per line so downstream line semantics survive."""
    if "<" not in html:
        return [Block(texts=[line]) for line in html.split("\n")]
    fast = _segment_fast(html)
    if fast is not None:
        return fast
    p = _BlockParser()
    try:
        p.feed(html)
        p.close()
    except Exception:
        # Malformed markup: degrade to tag-stripped text, one block.
        stripped = re.sub(r"<[^>]*>", " ", html)
        return [Block(texts=[stripped])]
    return p.blocks


def segment_blocks_reference(html: str) -> List[Block]:
    """HTMLParser-only path, exposed for parity testing of the fast
    tokenizer (tests assert segment_blocks == segment_blocks_reference)."""
    if "<" not in html:
        return [Block(texts=[line]) for line in html.split("\n")]
    p = _BlockParser()
    try:
        p.feed(html)
        p.close()
    except Exception:
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
