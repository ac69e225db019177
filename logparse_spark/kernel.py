"""Vectorized parse+match kernel (pure pandas/numpy, no Spark).

This is the single Python hot path of the engine (BASELINE.json:6: the
rule DSL "is compiled into vectorized pandas/Arrow UDFs ... with no
per-row Python"). It implements LogParse's ordered first-match rule
dispatch (SURVEY.md §3.1 step 3) as a loop over *rules* (a handful)
with a shrinking "unclaimed" row mask — never a loop over rows.

Per Arrow batch:
  for each rule in order:
      candidates = unclaimed rows (optionally pre-shrunk by a cheap
                   literal-substring mask derived from the pattern)
      matched    = vectorized regex search on candidates
      extract capture groups + render templates on matched rows only

Output columns (the UDF struct):
  rule_id   Int32 (null = unmatched)
  rule_name string (null = unmatched)
  action    string ("ignore"|"count"|"report"|"unmatched")
  sink_id   string ("ignored"|<rule name>|"unmatched")
  count_key string (count rules only)
  rendered  string (report: rendered template; count: key; unmatched:
            original text; ignore: null — the row is dropped downstream)
  captures  list<string> (regex capture groups, null-padded)
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

try:  # RE2 fast path for the match phase (see _re2_compatible)
    import pyarrow as pa
    import pyarrow.compute as pc
except Exception:  # pragma: no cover — pyarrow is baked into this env
    pa = pc = None

from .rules import CompiledRule, CompiledRules, SINK_UNMATCHED

OUTPUT_COLUMNS = [
    "rule_id", "rule_name", "action", "sink_id", "count_key", "rendered", "captures",
]

_CHAR_CLASS_RE = re.compile(r"\[(?:[^\]\\]|\\.)*\]")
_META_SPLIT_RE = re.compile(r"(?:\\.|[.^$*+?()\[\]{}|\\])+")


def required_literal(pattern: str, min_len: int = 4) -> str | None:
    """Derive a literal substring every match must contain, or None.

    Conservative: returns None when alternation or optional groups make
    any literal non-mandatory. Used as a cheap vectorized pre-filter
    (plain substring scan) before the regex engine runs (SURVEY.md §4
    "rule-dispatch strategy").
    """
    if "(?i" in pattern:
        # case-insensitive rule: a case-SENSITIVE substring prefilter
        # would drop case-variant matches — no literal is mandatory
        return None
    if "|" in pattern.replace("\\|", ""):
        return None
    if ")?" in pattern or ")*" in pattern or "){" in pattern:
        return None
    # char classes are not literals; replace with "()" so they split runs
    stripped = _CHAR_CLASS_RE.sub("()", pattern)
    best = ""
    pos = 0
    pieces: list[tuple[str, str]] = []
    for m in _META_SPLIT_RE.finditer(stripped):
        pieces.append((stripped[pos : m.start()], stripped[m.start()]))
        pos = m.end()
    pieces.append((stripped[pos:], ""))
    for lit, nextch in pieces:
        if nextch and nextch in "?*{":  # trailing char made optional by quantifier
            lit = lit[:-1]
        if len(lit) > len(best):
            best = lit
    return best if len(best) >= min_len else None


_RE2_OK_CACHE: dict[str, bool] = {}

# At/above this unclaimed fraction the per-rule match scans the FULL
# column and masks, instead of gathering candidates with pc.take first.
# Measured on the bench rule set (600k rows): a full-column RE2 scan
# costs ~0.036s while take+subset-scan costs ~0.06s at 90% selectivity —
# per-row, gather+scan ≈ 1.67x a plain scan, so the crossover sits near
# idx/n = 0.6. Log workloads keep most rows unclaimed until the late
# hot rules, so this removes the large string-array copies entirely.
_FULL_SCAN_FRAC = 0.6


def _re2_compatible(pattern: str) -> bool:
    """True when Arrow's RE2 engine accepts (and we may use) the
    pattern for the match phase. RE2 rejects backrefs/lookaround at
    compile time, so a one-element trial probe is a complete check;
    measured 4-5x faster than Python re for the match scan, with
    identical semantics on the supported subset (both are unanchored
    substring searches)."""
    if pc is None:
        return False
    ok = _RE2_OK_CACHE.get(pattern)
    if ok is None:
        try:
            pc.match_substring_regex(pa.array(["probe"]), pattern)
            ok = True
        except Exception:
            ok = False
        _RE2_OK_CACHE[pattern] = ok
    return ok


def named_group_pattern(pattern: str) -> str | None:
    """Rewrite unnamed capture groups to ``(?P<gN>``, wrap all as g0.

    Arrow's ``extract_regex`` returns one struct field per NAMED group
    and ignores unnamed ones, so extraction through RE2 needs this
    rewrite. The scanner tracks backslash escapes and character classes
    (including the ``[]]``/``[^]]`` literal-bracket forms) so a ``(``
    inside either never becomes a group. Returns None for patterns that
    already use named groups (g-name collisions would mis-map indices);
    those fall back to the pandas extraction path.
    """
    if "(?P<" in pattern or "(?'" in pattern:
        return None
    out: list[str] = []
    i, n, g = 0, len(pattern), 0
    in_class = False
    while i < n:
        c = pattern[i]
        if c == "\\" and i + 1 < n:
            out.append(pattern[i : i + 2])
            i += 2
            continue
        if in_class:
            if c == "]":
                in_class = False
            out.append(c)
            i += 1
            continue
        if c == "[":
            in_class = True
            out.append(c)
            i += 1
            # []] / [^]] : leading ] (after optional ^) is a literal
            if i < n and pattern[i] == "^":
                out.append("^")
                i += 1
            if i < n and pattern[i] == "]":
                out.append("]")
                i += 1
            continue
        if c == "(" and not pattern.startswith("(?", i):
            g += 1
            out.append(f"(?P<g{g}>")
            i += 1
            continue
        out.append(c)
        i += 1
    return "(?P<g0>" + "".join(out) + ")"


_NAMED_PAT_CACHE: dict[str, str | None] = {}


def _re2_extractable(pattern: str) -> str | None:
    """The named-group variant of ``pattern`` iff Arrow's RE2
    ``extract_regex`` accepts it, else None (pandas fallback). Keyed by
    pattern SOURCE (a pure value), so entries can never go stale."""
    if pattern in _NAMED_PAT_CACHE:
        return _NAMED_PAT_CACHE[pattern]
    named = named_group_pattern(pattern) if pc is not None else None
    if named is not None:
        try:
            pc.extract_regex(pa.array(["probe"]), named)
        except Exception:
            named = None
    _NAMED_PAT_CACHE[pattern] = named
    return named


def _extract_groups_arrow(
    sub_pa: "pa.Array", rule: CompiledRule
) -> pd.DataFrame | None:
    """RE2 extraction: (whole, g1..gn) columns for rows of ``sub_pa``,
    or None when the pattern needs the Python-re fallback.

    Replaces pandas ``str.extract`` (row-at-a-time Python re) on the
    hot path — measured 1.42s -> ~0.1s per 600k-row batch on the bench
    rule set. Callers pass only rows already known to match, so no
    null structs come back."""
    named = _re2_extractable(rule.spec.pattern)
    if named is None:
        return None
    res = pc.extract_regex(sub_pa, named)
    return pd.DataFrame(
        {
            # struct_field (not .field): works on chunked results too
            j: pc.struct_field(res, f"g{j}").to_numpy(zero_copy_only=False)
            for j in range(rule.n_groups + 1)
        }
    )


def _extract_groups(sub_pa, rows_at, rule: CompiledRule) -> pd.DataFrame:
    """Extraction dispatcher: RE2 on the hot path, Python re where
    semantics demand it.

    RE2's extract_regex cannot distinguish a NON-PARTICIPATING group
    (e.g. an unexercised ``(...)?``) from a participating EMPTY match —
    both come back ""; Python re (and Perl, the reference semantics)
    yield null for the former. So: extract through RE2, then re-extract
    JUST the rows where any capture came back "" (rare: requires an
    optional or star group, or an empty-capable pattern) through the
    exact engine. Exact semantics at vectorized cost.

    ``rows_at(positions)`` lazily materializes the matched rows as a
    pandas Series — only paid on fallback/ambiguous rows."""
    groups = (
        _extract_groups_arrow(sub_pa, rule) if sub_pa is not None else None
    )
    if groups is None:  # Python-re-only pattern (or no pyarrow)
        return _extract_with_whole(rows_at(None), rule)
    if rule.n_groups > 0:
        amb = (groups.iloc[:, 1:] == "").any(axis=1).to_numpy(dtype=bool)
        if amb.any():
            pos = np.flatnonzero(amb)
            redo = _extract_with_whole(rows_at(pos), rule)
            groups.iloc[pos, :] = redo.to_numpy(dtype=object)
    return groups


def _extract_with_whole(target: pd.Series, rule: CompiledRule) -> pd.DataFrame:
    """Extract (whole_match, g1..gn) for rows of ``target``.

    Wraps the pattern in an outer group so ``{0}`` (whole match) renders
    without a second regex pass. Limitation: numbered backreferences
    inside the pattern would shift — the DSL doesn't support them.
    """
    whole_rx = re.compile("(" + rule.spec.pattern + ")")
    return target.str.extract(whole_rx)


def _render(template, groups: pd.DataFrame) -> pd.Series:
    """Vectorized template render: groups col 0 = whole match, i = group i."""
    out: pd.Series | None = None
    for kind, val in template.parts:
        if kind == "lit":
            piece = pd.Series(val, index=groups.index, dtype=object)
        else:
            piece = groups.iloc[:, int(val)].fillna("").astype(object)
        out = piece if out is None else out + piece
    assert out is not None
    return out


def parse_and_match_pandas(
    text: pd.Series, tool: pd.Series, compiled: CompiledRules,
    prefilter: bool = False, slim: bool = False,
) -> pd.DataFrame:
    """The kernel: one Arrow batch in, OUTPUT_COLUMNS frame out.

    ``slim=True`` emits only (rule_id, rendered) — the minimum that
    must cross the JVM boundary; rule_name/action/sink_id are
    broadcast-joined back JVM-side from rule metadata (udf.with_match),
    and count_key == rendered for count rules by construction."""
    n = len(text)
    text = text.reset_index(drop=True).astype(object)
    tool = tool.reset_index(drop=True).astype(object)
    # Arrow copies for the RE2 match scan (one conversion per batch).
    # type= is load-bearing: an all-null batch otherwise infers a
    # null-typed array, for which match_substring_regex has no kernel
    text_pa = (pa.array(text, type=pa.string(), from_pandas=True)
               if pc is not None else None)
    tool_pa = (pa.array(tool, type=pa.string(), from_pandas=True)
               if pc is not None else None)

    rule_id = np.full(n, -1, dtype=np.int64)
    count_key = np.full(n, None, dtype=object)
    rendered = np.full(n, None, dtype=object)
    captures = np.full(n, None, dtype=object)
    unclaimed = np.ones(n, dtype=bool)

    # combined-alternation pre-scan (see _any_patterns): rows no rule
    # can match skip the per-rule loop entirely
    if pc is not None:
        eligible = np.zeros(n, dtype=bool)
        for field_name, arr in (("text", text_pa), ("tool", tool_pa)):
            pat = _any_patterns(compiled)[field_name]
            if pat is None:
                eligible |= True
            elif pat:
                m = pc.fill_null(pc.match_substring_regex(arr, pat), False)
                eligible |= m.to_numpy(zero_copy_only=False).astype(bool)
    else:  # pragma: no cover — pyarrow is baked into this env
        eligible = np.ones(n, dtype=bool)

    for chunk, bpats in _block_plans(compiled):
      remaining = unclaimed & eligible
      if not remaining.any():
          break
      bmask = None
      if (bpats is not None and pc is not None
              and remaining.sum() >= _BLOCK_MIN_FRAC * n):
          # one ~single-scan-cost pass decides which rows ANY of this
          # block's rules could match; the block's per-rule scans then
          # run only on those (often none for cold blocks)
          bmask = _block_mask(bpats, text_pa, tool_pa, n)
          if not (remaining & bmask).any():
              continue
      for rule in chunk:
        candidates = unclaimed & eligible
        if bmask is not None:
            candidates &= bmask
        if not candidates.any():
            continue
        on_text = rule.spec.field == "text"
        target_all = text if on_text else tool
        idx = np.flatnonzero(candidates)
        sub = target_all if idx.size == n else target_all.iloc[idx]

        if prefilter:
            lit = required_literal(rule.spec.pattern)
            if lit is not None:
                coarse = sub.str.contains(lit, regex=False, na=False).to_numpy()
                idx = idx[coarse]
                if idx.size == 0:
                    continue
                sub = target_all.iloc[idx]

        if _re2_compatible(rule.spec.pattern):
            arr = text_pa if on_text else tool_pa
            if idx.size >= _FULL_SCAN_FRAC * n:
                # scan the whole column and mask — no gather copy
                # (see _FULL_SCAN_FRAC); the literal prefilter above
                # may have shrunk idx below candidates, so re-AND
                keep = np.zeros(n, dtype=bool)
                keep[idx] = True
                m = pc.fill_null(
                    pc.match_substring_regex(arr, rule.spec.pattern), False
                )
                full = m.to_numpy(zero_copy_only=False).astype(bool)
                hit = np.flatnonzero(full & keep)
            else:
                sub_pa = pc.take(arr, pa.array(idx))
                m = pc.fill_null(
                    pc.match_substring_regex(sub_pa, rule.spec.pattern), False
                )
                hit = idx[m.to_numpy(zero_copy_only=False).astype(bool)]
        else:  # Python-regex-only feature (backref/lookaround) fallback
            hit = idx[sub.str.contains(rule.regex_search, na=False).to_numpy()]
        if hit.size == 0:
            continue
        rule_id[hit] = rule.rule_id
        unclaimed[hit] = False

        needs_groups = rule.n_groups > 0 or rule.template is not None
        if not needs_groups:
            continue
        sub_hit = (pc.take(text_pa if on_text else tool_pa, pa.array(hit))
                   if pc is not None else None)
        groups = _extract_groups(
            sub_hit,
            lambda pos: target_all.iloc[hit if pos is None else hit[pos]],
            rule,
        )
        if rule.n_groups > 0:
            caps = groups.iloc[:, 1:].to_numpy(dtype=object)
            caps = [
                [None if (g is None or g != g) else str(g) for g in row]
                for row in caps
            ]
            captures[hit] = pd.Series(caps, index=range(len(caps)), dtype=object).to_numpy()
        if rule.template is not None:
            vals = _render(rule.template, groups).to_numpy(dtype=object)
            if rule.spec.action == "count":
                count_key[hit] = vals
                rendered[hit] = vals
            elif rule.spec.action == "sum":
                # payload = extracted VALUE; key has its own template
                rendered[hit] = vals
                count_key[hit] = _render(
                    rule.key_template, groups).to_numpy(dtype=object)
            else:  # report
                rendered[hit] = vals

    # unmatched rows carry the original text as their routed payload
    un = np.flatnonzero(unclaimed)
    if un.size:
        rendered[un] = text.iloc[un].to_numpy(dtype=object)
    return _assemble_pandas_output(
        compiled, rule_id, count_key, rendered, captures, slim
    )


def _any_patterns(compiled: CompiledRules) -> dict[str, str | None]:
    """Combined alternation pattern per field, or None when any rule of
    that field is not RE2-compatible (prefiltering then unsafe).

    RE2 compiles alternations into one DFA, so ONE pass with
    `(?:p1)|(?:p2)|...` answers "could any rule match this row" at
    roughly the cost of a single rule's scan. Rows failing it skip the
    whole per-rule loop — for log workloads where most lines match no
    rule (the unmatched bucket), that converts O(rules) scans per row
    into O(1). Capture groups are stripped (nogroup) — match-only.

    MEMOIZED ON THE COMPILED OBJECT itself (object.__setattr__ works on
    the frozen dataclass): the combined pattern is a pure function of
    the rule set, so storing it with the object makes the earlier bug
    classes unrepresentable — no process-global cache to grow without
    bound, no id()-keyed entries to go stale when a collected object's
    id is reused (which silently routed matchable rows to the unmatched
    bucket), and no per-batch cache-key construction."""
    got = getattr(compiled, "_any_patterns_memo", None)
    if got is None:
        got = {}
        from .rules import nogroup_pattern

        for field_name in ("text", "tool"):
            pats = [r.spec.pattern for r in compiled.rules
                    if r.spec.field == field_name]
            if not pats:
                got[field_name] = ""  # no rules -> nothing can match
            elif all(_re2_compatible(p) for p in pats):
                combined = "|".join(f"(?:{nogroup_pattern(p)})" for p in pats)
                got[field_name] = combined if _re2_compatible(combined) else None
            else:
                got[field_name] = None  # a non-RE2 rule -> no prefilter
        object.__setattr__(compiled, "_any_patterns_memo", got)
    return got


# Rules per block-prescan group. RE2 compiles an alternation of ~8
# patterns into one DFA scanned at near single-pattern cost, so one
# block scan replaces up to 8 per-rule scans for every row the block
# cannot match. Blocks follow RULE ORDER (they only ever SKIP rows a
# block's rules cannot match — never reorder dispatch).
_BLOCK_SIZE = 8

# Below this fraction of still-candidate rows, a block's full-column
# prescan costs more than the per-rule subset scans it would save.
_BLOCK_MIN_FRAC = 0.05


def _block_plans(compiled: CompiledRules) -> list:
    """[(rules_chunk, {field: combined_nogroup_pattern | ""})] per
    _BLOCK_SIZE rules, or (chunk, None) when any rule in the chunk is
    not RE2-compatible (that block then cannot pre-skip rows). Same
    memo-on-the-object pattern (and rationale) as _any_patterns."""
    got = getattr(compiled, "_block_plans_memo", None)
    if got is None:
        from .rules import nogroup_pattern

        got = []
        rules = compiled.rules
        for s in range(0, len(rules), _BLOCK_SIZE):
            chunk = rules[s : s + _BLOCK_SIZE]
            pats: dict[str, str] | None = {}
            for field_name in ("text", "tool"):
                fps = [r.spec.pattern for r in chunk
                       if r.spec.field == field_name]
                if not fps:
                    pats[field_name] = ""  # no rules on this field
                elif all(_re2_compatible(p) for p in fps):
                    comb = "|".join(f"(?:{nogroup_pattern(p)})" for p in fps)
                    if _re2_compatible(comb):
                        pats[field_name] = comb
                    else:
                        pats = None
                        break
                else:
                    pats = None
                    break
            got.append((chunk, pats))
        object.__setattr__(compiled, "_block_plans_memo", got)
    return got


def _block_mask(
    pats: dict[str, str], text_pa, tool_pa, n: int
) -> np.ndarray:
    """Rows that could match SOME rule of the block (full-column OR
    over the block's per-field combined patterns)."""
    bm = np.zeros(n, dtype=bool)
    for field_name, arr in (("text", text_pa), ("tool", tool_pa)):
        p = pats[field_name]
        if p:
            m = pc.fill_null(pc.match_substring_regex(arr, p), False)
            bm |= m.to_numpy(zero_copy_only=False).astype(bool)
    return bm


def parse_and_match_arrow(
    text_pa: "pa.Array", tool_pa: "pa.Array", compiled: CompiledRules
) -> tuple["pa.Array", "pa.Array"]:
    """Arrow-native kernel: RE2 match scan directly on Spark's Arrow
    buffers (scalar arrow_udf path) — zero arrow->pandas->arrow round
    trips.

    The pandas-UDF path converts every batch to pandas before the
    kernel and back after; at 16+ parallel workers those two full
    string copies saturate memory bandwidth and per-core throughput
    collapses (measured 147k -> 93k rows/s/core). Here only MATCHED
    subsets (small) ever become Python objects, for capture extraction
    and template render.

    Returns (rule_id int32 with nulls for unmatched, rendered string).
    First-match-wins semantics identical to parse_and_match_pandas —
    shared per-rule order, shrinking unclaimed mask."""
    n = len(text_pa)
    rule_id = np.full(n, -1, dtype=np.int64)
    rendered = np.full(n, None, dtype=object)
    unclaimed = np.ones(n, dtype=bool)

    # combined-alternation pre-scan: rows that can match NO rule on
    # either field never enter the per-rule loop (they stay unclaimed
    # and fall straight through to the unmatched bucket)
    eligible = np.zeros(n, dtype=bool)
    anypats = _any_patterns(compiled)
    for field_name, arr in (("text", text_pa), ("tool", tool_pa)):
        pat = anypats[field_name]
        if pat is None:  # non-RE2 rule present: cannot prefilter
            eligible |= True
        elif pat:
            m = pc.fill_null(pc.match_substring_regex(arr, pat), False)
            eligible |= m.to_numpy(zero_copy_only=False).astype(bool)

    # pandas views for the rare non-RE2 rule and for extraction subsets
    text_pd: pd.Series | None = None
    tool_pd: pd.Series | None = None

    def _pd(on_text: bool) -> pd.Series:
        nonlocal text_pd, tool_pd
        if on_text:
            if text_pd is None:
                text_pd = text_pa.to_pandas().astype(object)
            return text_pd
        if tool_pd is None:
            tool_pd = tool_pa.to_pandas().astype(object)
        return tool_pd

    for chunk, bpats in _block_plans(compiled):
      remaining = unclaimed & eligible
      if not remaining.any():
          break
      bmask = None
      if bpats is not None and remaining.sum() >= _BLOCK_MIN_FRAC * n:
          # same block pre-skip as the pandas kernel (see _block_plans)
          bmask = _block_mask(bpats, text_pa, tool_pa, n)
          if not (remaining & bmask).any():
              continue
      for rule in chunk:
        candidates = unclaimed & eligible
        if bmask is not None:
            candidates &= bmask
        if not candidates.any():
            continue
        on_text = rule.spec.field == "text"
        idx = np.flatnonzero(candidates)
        if _re2_compatible(rule.spec.pattern):
            arr = text_pa if on_text else tool_pa
            if idx.size >= _FULL_SCAN_FRAC * n:
                # scan the whole column and mask: cheaper than gathering
                # a large candidate subset first (see _FULL_SCAN_FRAC)
                m = pc.fill_null(
                    pc.match_substring_regex(arr, rule.spec.pattern), False
                )
                full = m.to_numpy(zero_copy_only=False).astype(bool)
                hit = np.flatnonzero(full & candidates)
            else:
                sub = pc.take(arr, pa.array(idx))
                m = pc.fill_null(
                    pc.match_substring_regex(sub, rule.spec.pattern), False
                )
                hit = idx[m.to_numpy(zero_copy_only=False).astype(bool)]
        else:
            sub_pd = _pd(on_text).iloc[idx]
            hit = idx[sub_pd.str.contains(rule.regex_search, na=False).to_numpy()]
        if hit.size == 0:
            continue
        rule_id[hit] = rule.rule_id
        unclaimed[hit] = False

        if rule.template is not None:
            arr = text_pa if on_text else tool_pa
            groups = _extract_groups(
                pc.take(arr, pa.array(hit)),
                lambda pos: _pd(on_text).iloc[hit if pos is None else hit[pos]],
                rule,
            )
            rendered[hit] = _render(rule.template, groups).to_numpy(dtype=object)

    un = np.flatnonzero(unclaimed)
    if un.size:
        # unmatched payload = original text; slice arrow-side, small-ish
        rendered[un] = pc.take(text_pa, pa.array(un)).to_numpy(
            zero_copy_only=False
        )

    rid = pd.array(rule_id, dtype="Int64")
    rid[rule_id < 0] = pd.NA
    return (
        pa.array(rid, type=pa.int32(), from_pandas=True),
        pa.array(rendered, type=pa.string(), from_pandas=True),
    )


def _assemble_pandas_output(
    compiled: CompiledRules,
    rule_id: np.ndarray,
    count_key: np.ndarray,
    rendered: np.ndarray,
    captures: np.ndarray,
    slim: bool,
) -> pd.DataFrame:
    if slim:
        rid = pd.Series(rule_id).astype("Int32")
        rid[rule_id < 0] = pd.NA
        return pd.DataFrame(
            {"rule_id": rid, "rendered": pd.Series(rendered, dtype=object)}
        )

    id2name = {r.rule_id: r.spec.name for r in compiled.rules}
    id2action = {r.rule_id: r.spec.action for r in compiled.rules}
    id2sink = {r.rule_id: r.sink_id for r in compiled.rules}

    rid = pd.Series(rule_id).astype("Int32")
    rid[rule_id < 0] = pd.NA
    return pd.DataFrame(
        {
            "rule_id": rid,
            "rule_name": pd.Series(rule_id).map(id2name),
            "action": pd.Series(rule_id).map(id2action).fillna(SINK_UNMATCHED),
            "sink_id": pd.Series(rule_id).map(id2sink).fillna(SINK_UNMATCHED),
            "count_key": pd.Series(count_key, dtype=object),
            "rendered": pd.Series(rendered, dtype=object),
            "captures": pd.Series(captures, dtype=object),
        }
    )
