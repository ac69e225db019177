"""Grok-style named patterns for the rule DSL (driver-side, no Spark).

The north star describes the parse stage as "grok/regex extraction"
(BASELINE.json:6); SURVEY.md §2.1 P1 maps it here. A rule pattern may
embed ``%{NAME}`` (match-only) or ``%{NAME:field}`` (capture as
``field``) tokens, where ``NAME`` is a library pattern. Expansion
happens once at rule-compile time and produces a *plain numbered-group
regex* plus a ``field -> group number`` map, so everything downstream —
the vectorized kernels, the codegen CASE engine, and the DuckDB oracle
SQL — keeps working on ordinary regexes with ordinary group numbers.
No engine (Python re / Arrow RE2 / Java / DuckDB) ever sees a named
group, sidestepping their three incompatible named-group syntaxes.

The library re-expresses the standard public grok names (WORD, INT,
NUMBER, IPV4, LOGLEVEL, ...) as fresh RE2-safe regexes: no backrefs,
no lookaround, internal groups all non-capturing — so the Arrow RE2
fast path in kernel.py applies to grok rules too.
"""

from __future__ import annotations

import re


class GrokError(ValueError):
    """Malformed grok usage: unknown name, duplicate field, cycle."""


# Library patterns. Values may reference other library entries with
# %{NAME} (no :field inside the library). Every entry must be RE2-safe
# and contain no capturing groups (tested in tests/test_grok.py).
GROK_LIBRARY: dict[str, str] = {
    "WORD": r"\b\w+\b",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "INT": r"[+-]?\d+",
    "NONNEGINT": r"\d+",
    "POSINT": r"[1-9]\d*",
    "BASE10NUM": r"[+-]?(?:\d+(?:\.\d+)?|\.\d+)",
    "NUMBER": r"%{BASE10NUM}",
    "BASE16NUM": r"[+-]?(?:0[xX])?[0-9A-Fa-f]+",
    "USERNAME": r"[A-Za-z0-9._-]+",
    "USER": r"%{USERNAME}",
    "IPV4": (
        r"(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)"
        r"(?:\.(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)){3}"
    ),
    "IP": r"%{IPV4}",
    "HOSTNAME": (
        r"\b[0-9A-Za-z][0-9A-Za-z-]{0,62}"
        r"(?:\.[0-9A-Za-z][0-9A-Za-z-]{0,62})*\.?\b"
    ),
    "IPORHOST": r"(?:%{IPV4}|%{HOSTNAME})",
    "HOSTPORT": r"%{IPORHOST}:%{POSINT}",
    "UUID": r"[0-9A-Fa-f]{8}-(?:[0-9A-Fa-f]{4}-){3}[0-9A-Fa-f]{12}",
    "LOGLEVEL": (
        r"(?:[Aa]lert|ALERT|[Tt]race|TRACE|[Dd]ebug|DEBUG|[Nn]otice|NOTICE"
        r"|[Ii]nfo|INFO|[Ww]arn(?:ing)?|WARN(?:ING)?|[Ee]rr(?:or)?"
        r"|ERR(?:OR)?|[Cc]rit(?:ical)?|CRIT(?:ICAL)?|[Ff]atal|FATAL"
        r"|[Ss]evere|SEVERE|EMERG(?:ENCY)?|[Ee]merg(?:ency)?)"
    ),
    "YEAR": r"(?:\d\d){1,2}",
    "MONTHNUM": r"(?:0?[1-9]|1[0-2])",
    "MONTHDAY": r"(?:(?:0[1-9])|(?:[12]\d)|(?:3[01])|[1-9])",
    "MONTH": (
        r"\b(?:[Jj]an(?:uary)?|[Ff]eb(?:ruary)?|[Mm]ar(?:ch)?|[Aa]pr(?:il)?"
        r"|[Mm]ay|[Jj]un(?:e)?|[Jj]ul(?:y)?|[Aa]ug(?:ust)?"
        r"|[Ss]ep(?:tember)?|[Oo]ct(?:ober)?|[Nn]ov(?:ember)?"
        r"|[Dd]ec(?:ember)?)\b"
    ),
    "HOUR": r"(?:2[0123]|[01]?\d)",
    "MINUTE": r"(?:[0-5]\d)",
    "SECOND": r"(?:[0-5]\d|60)(?:\.\d+)?",
    "TIME": r"%{HOUR}:%{MINUTE}:%{SECOND}",
    "SYSLOGTIMESTAMP": r"%{MONTH} +%{MONTHDAY} %{TIME}",
    "TIMESTAMP_ISO8601": (
        r"%{YEAR}-%{MONTHNUM}-%{MONTHDAY}[T ]%{HOUR}:%{MINUTE}"
        r"(?::%{SECOND})?(?:Z|[+-]%{HOUR}(?::?%{MINUTE})?)?"
    ),
    "UNIXPATH": r"(?:/[\w.,:;=@#$%+-]+)+/?",
    "QUOTEDSTRING": r"(?:\"[^\"]*\"|'[^']*')",
    "HTTPMETHOD": r"(?:GET|POST|PUT|DELETE|HEAD|OPTIONS|PATCH|TRACE|CONNECT)",
    "WORDCHAIN": r"\w+(?:\.\w+)*",
    # -- network identifiers ------------------------------------------
    "COMMONMAC": r"(?:[A-Fa-f0-9]{2}:){5}[A-Fa-f0-9]{2}",
    "WINDOWSMAC": r"(?:[A-Fa-f0-9]{2}-){5}[A-Fa-f0-9]{2}",
    "CISCOMAC": r"(?:[A-Fa-f0-9]{4}\.){2}[A-Fa-f0-9]{4}",
    "MAC": r"(?:%{CISCOMAC}|%{WINDOWSMAC}|%{COMMONMAC})",
    # full RFC-4291 enumeration (uncompressed + every '::' position);
    # alternation-only, so RE2-safe like the rest of the library
    "IPV6": (
        r"(?:(?:[0-9A-Fa-f]{1,4}:){7}[0-9A-Fa-f]{1,4}"
        r"|(?:[0-9A-Fa-f]{1,4}:){1,7}:"
        r"|(?:[0-9A-Fa-f]{1,4}:){1,6}:[0-9A-Fa-f]{1,4}"
        r"|(?:[0-9A-Fa-f]{1,4}:){1,5}(?::[0-9A-Fa-f]{1,4}){1,2}"
        r"|(?:[0-9A-Fa-f]{1,4}:){1,4}(?::[0-9A-Fa-f]{1,4}){1,3}"
        r"|(?:[0-9A-Fa-f]{1,4}:){1,3}(?::[0-9A-Fa-f]{1,4}){1,4}"
        r"|(?:[0-9A-Fa-f]{1,4}:){1,2}(?::[0-9A-Fa-f]{1,4}){1,5}"
        r"|[0-9A-Fa-f]{1,4}:(?::[0-9A-Fa-f]{1,4}){1,6}"
        r"|:(?::[0-9A-Fa-f]{1,4}){1,7}"
        r"|::)"
    ),
    "EMAILLOCALPART": r"[A-Za-z][A-Za-z0-9_.+=:-]*",
    "EMAILADDRESS": r"%{EMAILLOCALPART}@%{HOSTNAME}",
    # -- URIs ----------------------------------------------------------
    "URIPROTO": r"[A-Za-z]+(?:\+[A-Za-z+]+)?",
    "URIHOST": r"%{IPORHOST}(?::%{POSINT})?",
    "URIPATH": r"(?:/[A-Za-z0-9$.+!*'(){},~:;=@#%&_^-]*)+",
    "URIPARAM": r"\?[A-Za-z0-9$.+!*'|(){},~@#%&/=:;_?\[\]<>-]*",
    "URIPATHPARAM": r"%{URIPATH}(?:%{URIPARAM})?",
    "URI": (
        r"%{URIPROTO}://(?:%{USER}(?::[^@]*)?@)?"
        r"(?:%{URIHOST})?(?:%{URIPATHPARAM})?"
    ),
    # -- web access-log composites ------------------------------------
    # capture-free by design (library entries may not capture — add
    # %{...:field} names in the RULE that uses them, or wrap pieces)
    "HTTPDATE": r"%{MONTHDAY}/%{MONTH}/%{YEAR}:%{TIME} %{INT}",
    "COMMONAPACHELOG": (
        r'%{IPORHOST} %{USER} %{USER} \[%{HTTPDATE}\] '
        r'"(?:%{WORD} %{NOTSPACE}(?: HTTP/%{BASE10NUM})?|-)" '
        r"%{NONNEGINT} (?:%{NONNEGINT}|-)"
    ),
    "COMBINEDAPACHELOG": r'%{COMMONAPACHELOG} "[^"]*" "[^"]*"',
}

_TOKEN_RE = re.compile(r"%\{(\w+)(?::([A-Za-z]\w*))?\}")
# Unescaped capturing '(' (same limitation set as rules.nogroup_pattern:
# a '(' inside a character class is miscounted — the DSL doesn't use that).
_CAPTURE_OPEN_RE = re.compile(r"(?<!\\)\((?!\?)")

_RESOLVED: dict[str, str] = {}


def _resolve(name: str, stack: tuple[str, ...] = ()) -> str:
    """Fully expand a library entry to a self-contained regex."""
    if name in stack:
        raise GrokError(f"grok pattern cycle: {' -> '.join(stack + (name,))}")
    cached = _RESOLVED.get(name)
    if cached is not None:
        return cached
    try:
        raw = GROK_LIBRARY[name]
    except KeyError:
        raise GrokError(f"unknown grok pattern %{{{name}}}") from None

    def sub(m: re.Match) -> str:
        if m.group(2):
            raise GrokError(
                f"library pattern {name!r} may not capture (%{{{m.group(1)}:{m.group(2)}}})"
            )
        return "(?:" + _resolve(m.group(1), stack + (name,)) + ")"

    out = _TOKEN_RE.sub(sub, raw)
    _RESOLVED[name] = out
    return out


def expand_grok(pattern: str) -> tuple[str, dict[str, int]]:
    """Expand ``%{NAME[:field]}`` tokens into a numbered-group regex.

    Returns ``(expanded_pattern, {field: capture_group_number})``.
    Group numbers account for literal ``(...)`` groups the author wrote
    around/between tokens, in left-to-right order, so ``{field}``
    template references and ``{n}`` numeric references can coexist.
    """
    out: list[str] = []
    fields: dict[str, int] = {}
    gcount = 0
    pos = 0
    for m in _TOKEN_RE.finditer(pattern):
        lit = pattern[pos : m.start()]
        out.append(lit)
        gcount += len(_CAPTURE_OPEN_RE.findall(lit))
        body = _resolve(m.group(1))
        field = m.group(2)
        if field:
            if field in fields:
                raise GrokError(f"duplicate grok field {field!r} in pattern")
            gcount += 1
            fields[field] = gcount
            out.append("(" + body + ")")
        else:
            out.append("(?:" + body + ")")
        pos = m.end()
    tail = pattern[pos:]
    out.append(tail)
    return "".join(out), fields
