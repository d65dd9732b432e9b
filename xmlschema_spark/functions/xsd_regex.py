"""XSD regular expression -> Java regex translation for `rlike`.

XSD patterns differ from Java/PCRE (reference: translate_pattern usage at
xmlschema/validators/facets.py:755-769, backed by elementpath's
translate_pattern):
  1. Implicit anchoring: an XSD pattern matches the WHOLE lexical value.
  2. Multi-character escapes \\i \\c (XML name start/char) and \\I \\C.
  3. Character class subtraction [a-z-[aeiou]] -> Java's [a-z&&[^aeiou]].
  4. `.` matches any char except newline in both — close enough for data.

This is the minimal, data-oriented subset; XSD features with no use over
tabular values (multi-char escape in class ranges, nested subtraction
beyond one level) raise ValueError so misuse is loud at compile time.
"""

from __future__ import annotations

import re

# XML NameStartChar / NameChar approximations (ASCII + common unicode ranges)
_NAME_START = r"A-Za-z_À-ÖØ-öø-˿Ͱ-῿"
_NAME_CHAR = _NAME_START + r"0-9\-\.·"

_MULTI_ESCAPES = {
    "i": f"[{_NAME_START}]",
    "I": f"[^{_NAME_START}]",
    "c": f"[{_NAME_CHAR}]",
    "C": f"[^{_NAME_CHAR}]",
}

_SUBTRACT_RE = re.compile(r"\[([^\[\]]*)-\[([^\[\]]*)\]\]")


def translate_xsd_pattern(pattern: str, anchor: bool = True) -> str:
    """Translate one XSD pattern to a Java-regex string for Column.rlike."""
    out: list[str] = []
    i, n = 0, len(pattern)
    while i < n:
        ch = pattern[i]
        if ch == "\\" and i + 1 < n:
            nxt = pattern[i + 1]
            if nxt in _MULTI_ESCAPES:
                out.append(_MULTI_ESCAPES[nxt])
                i += 2
                continue
            out.append(ch + nxt)
            i += 2
            continue
        out.append(ch)
        i += 1
    java = "".join(out)
    # class subtraction: [A-[B]] -> [A&&[^B]]
    java = _SUBTRACT_RE.sub(lambda m: f"[{m.group(1)}&&[^{m.group(2)}]]", java)
    if anchor:
        java = f"^(?:{java})$"
    return java
