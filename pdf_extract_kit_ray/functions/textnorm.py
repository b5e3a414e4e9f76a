"""Text / LaTeX normalizers (pure, vectorizable scalar functions).

Semantics pinned to the reference:
* ``latex_compact``  — project/pdf2markdown/scripts/pdf2markdown.py:23-39
  (``latex_rm_whitespace``)
* ``escape_markdown`` — pdf_extract_kit/utils/merge_blocks_and_spans.py:207-215
* ``detect_lang``     — pdf_extract_kit/utils/merge_blocks_and_spans.py:195-205
"""

from __future__ import annotations

import re

# The protected-group / letter classes are semantic constants of the reference
# normalizer (pdf2markdown.py:26-28); the char class [\W_^\d] deliberately
# includes underscore, caret and digits as "non-letters".
_PROTECT_RE = re.compile(r"(\\(operatorname|mathrm|text|mathbf)\s?\*? {.*?})")
_LETTER = "[a-zA-Z]"
_NONLETTER = r"[\W_^\d]"
_NN = re.compile(r"(?!\\ )(%s)\s+?(%s)" % (_NONLETTER, _NONLETTER))
_NL = re.compile(r"(?!\\ )(%s)\s+?(%s)" % (_NONLETTER, _LETTER))
_LN = re.compile(r"(%s)\s+?(%s)" % (_LETTER, _NONLETTER))
_WS_RE = re.compile(r"\s")


import functools


@functools.lru_cache(maxsize=65536)
def latex_compact(s: str) -> str:
    """Collapse whitespace between non-letter/letter boundaries in LaTeX,
    protecting ``\\operatorname/\\mathrm/\\text/\\mathbf { ... }`` groups by
    first rewriting them space-free, then iterating the three collapse rules
    to a fixed point — byte-identical to the reference normalizer.

    Pure function of the string, so results are memoized per worker
    (bounded LRU): recognized formulas repeat heavily across a corpus and
    the fixed-point regex iteration is ~65us a call."""
    if " " not in s and not _WS_RE.search(s):
        return s                 # whitespace-free strings are fixed points
    protected = [m[0].replace(" ", "") for m in _PROTECT_RE.findall(s)]
    it = iter(protected)
    s = _PROTECT_RE.sub(lambda _m: next(it), s)
    while True:
        collapsed = _NN.sub(r"\1\2", s)
        collapsed = _NL.sub(r"\1\2", collapsed)
        collapsed = _LN.sub(r"\1\2", collapsed)
        if collapsed == s:
            return s
        s = collapsed
        if not _WS_RE.search(s):
            return s             # fully collapsed: skip the confirm pass


_MD_SPECIALS = ("*", "`", "~", "$")


def escape_markdown(content: str) -> str:
    """Backslash-escape markdown-significant chars in OCR text."""
    for ch in _MD_SPECIALS:
        content = content.replace(ch, "\\" + ch)
    return content


def detect_lang(text: str) -> str:
    """'zh' iff the string contains any CJK char in U+4E00..U+9FFF, else 'en'
    (drives the no-space-join rule for Chinese lines)."""
    for ch in text:
        if "\u4e00" <= ch <= "\u9fff":
            return "zh"
    return "en"
