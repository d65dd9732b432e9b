"""XSD regular expression -> Java regex translation for `rlike`.

XSD patterns differ from Java/PCRE (reference: translate_pattern usage at
xmlschema/validators/facets.py:755-769, backed by elementpath's
translate_pattern):
  1. Implicit anchoring: an XSD pattern matches the WHOLE lexical value.
  2. Multi-character escapes \\i \\c (XML name start/char) and \\I \\C.
  3. Character class subtraction, arbitrarily nested:
     [a-z-[aeiou-[e]]]  ->  [a-z&&[[^aeiou]e]]
     (X - (A - B) needs the COMPLEMENT of the subtrahend; the parser
     builds a small class AST and emits Java `&&`-intersection /
     union-of-classes forms for class and complement respectively).
  4. Unicode blocks: XSD spells blocks \\p{IsBasicLatin}; Java spells
     them \\p{InBasicLatin} (Is- is for scripts/binary props in Java).
     Categories (\\p{Lu}, \\p{Nd}, ...) are spelled identically.
  5. `.` matches any char except newline in both — close enough for data.

Everything stays a plain Java regex string, so the pattern runs inside
whole-stage codegen via Column.rlike — never a Python UDF.
"""

from __future__ import annotations

import re

# XML NameStartChar / NameChar approximations (ASCII + common unicode
# ranges) as RAW RANGE TEXT usable both bare-wrapped and inside classes.
# ':' IS a NameStartChar per XML 1.0 — xs:Name admits colons and
# xs:NCName is defined by the class subtraction [\i-[:]] (XSD pt.2 App
# F); omitting it here silently made \i equal NCName semantics.
_NAME_START = r":A-Za-z_À-ÖØ-öø-˿Ͱ-῿"
_NAME_CHAR = _NAME_START + r"0-9\-\.·"

_MULTI_ESCAPES = {
    "i": f"[{_NAME_START}]",
    "I": f"[^{_NAME_START}]",
    "c": f"[{_NAME_CHAR}]",
    "C": f"[^{_NAME_CHAR}]",
}
_CLASS_RANGES = {"i": _NAME_START, "c": _NAME_CHAR}

_PROP_RE = re.compile(r"\\([pP])\{([^}]+)\}")


def _fix_prop(m: re.Match) -> str:
    name = m.group(2)
    if name.startswith("Is"):          # XSD block -> Java block spelling
        name = "In" + name[2:]
    return f"\\{m.group(1)}{{{name}}}"


class _Cls:
    """Character-class AST: (neg ? complement(body) : body) minus sub."""

    __slots__ = ("neg", "body", "sub")

    def __init__(self, neg: bool, body: str, sub: "_Cls | None"):
        self.neg, self.body, self.sub = neg, body, sub

    def java(self) -> str:
        base = f"{'^' if self.neg else ''}{self.body}"
        if self.sub is None:
            return f"[{base}]"
        # X - S  ->  [X && complement(S)]
        return f"[{base}&&{self.sub.java_neg()}]"

    def java_neg(self) -> str:
        if self.sub is None:
            return f"[{'^' if not self.neg else ''}{self.body}]"
        # not(X - S) = not(X) union S  ->  Java class union [[^X][S]]
        inner = _Cls(not self.neg, self.body, None)
        return f"[{inner.java()}{self.sub.java()}]"


def _parse_class(p: str, i: int) -> tuple[_Cls, int]:
    """Parse a charClassExpr starting at p[i] == '['; returns (ast, next).
    XSD grammar: '[' '^'? body ('-' charClassExpr)? ']' — subtraction is
    only valid as the final member (W3C XML Schema part 2, appendix F)."""
    assert p[i] == "["
    j = i + 1
    neg = False
    if j < len(p) and p[j] == "^":
        neg, j = True, j + 1
    body: list[str] = []
    sub: _Cls | None = None
    while j < len(p):
        c = p[j]
        if c == "\\" and j + 1 < len(p):
            nxt = p[j + 1]
            if nxt in ("i", "c"):
                body.append(_CLASS_RANGES[nxt])
                j += 2
                continue
            if nxt in ("I", "C"):
                raise ValueError(
                    f"negated name escape \\{nxt} inside a character class "
                    "is not supported (complement-in-class)")
            m = _PROP_RE.match(p, j)
            if m:
                body.append(_fix_prop(m))
                j = m.end()
                continue
            body.append(c + nxt)
            j += 2
            continue
        if c == "-" and j + 1 < len(p) and p[j + 1] == "[":
            sub, j = _parse_class(p, j + 1)
            if j >= len(p) or p[j] != "]":
                raise ValueError(
                    f"class subtraction must end the class: {p!r}")
            return _Cls(neg, "".join(body), sub), j + 1
        if c == "]":
            return _Cls(neg, "".join(body), sub), j + 1
        body.append(c)
        j += 1
    raise ValueError(f"unterminated character class in pattern: {p!r}")


def translate_xsd_pattern(pattern: str, anchor: bool = True,
                          xpath_anchors: bool = False) -> str:
    """Translate one XSD pattern to a Java-regex string for Column.rlike.

    xpath_anchors=True switches to XPath fn:matches() flavor: ^ and $
    are REAL anchors there (XPath F&O 5.6.1 extends XSD regex with
    anchors), so they pass through unescaped."""
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
            m = _PROP_RE.match(pattern, i)
            if m:
                out.append(_fix_prop(m))
                i = m.end()
                continue
            out.append(ch + nxt)
            i += 2
            continue
        if ch == "[":
            cls, i = _parse_class(pattern, i)
            out.append(cls.java())
            continue
        if ch in "^$" and not xpath_anchors:
            # NOT metacharacters in XSD regex (XSD pt.2 App F: the
            # metacharacters are .\?*+{}()[]|) — 'a^b' and 'US$' match
            # those literal characters; Java would read anchors
            out.append("\\" + ch)
            i += 1
            continue
        out.append(ch)
        i += 1
    java = "".join(out)
    if anchor:
        java = f"^(?:{java})$"
    return java
