"""Pure-Python single-threaded reference oracle (SURVEY.md §5 item 1).

Re-implements the extraction / linking / canonicalization semantics
row-at-a-time — the stand-in for the reference implementation's
behavior (lexicator's per-page Python loop, §3.1).  Shares rule
CONTENT with the Spark engine via ``lexicator_spark.rules`` but shares
no Spark code: any disagreement in the P/R parity test is a
distributed-semantics bug.
"""

from __future__ import annotations

from lexicator_spark import rules


def extract_oracle(rows: list[tuple]) -> set[tuple[str, str, str]]:
    """rows = (conv_id, turn_idx, role, text, tool, ts) in ANY order →
    the Stage-A triple set (subj, pred, obj)."""
    triples: set[tuple[str, str, str]] = set()
    by_conv: dict[str, list[tuple]] = {}
    for r in rows:
        by_conv.setdefault(r[0], []).append(r)
    for conv_id, turns in by_conv.items():
        turns.sort(key=lambda r: r[1])  # stable (conv_id, turn_idx) order
        prev_idx = None
        for _, turn_idx, _role, text, tool, _ts in turns:
            uri = rules.turn_uri(conv_id, turn_idx)
            if tool is not None:
                triples.add((uri, rules.PRED_USES_TOOL, tool))
            if prev_idx is not None:
                triples.add(
                    (uri, rules.PRED_REPLIES_TO, rules.turn_uri(conv_id, prev_idx))
                )
            prev_idx = turn_idx
            if not text:
                continue
            for m in rules.MENTION_RE.findall(text):
                triples.add((uri, rules.PRED_MENTIONS, rules.normalize_surface(m)))
            for m in rules.WIKILINK_RE.findall(text):
                triples.add((uri, rules.PRED_MENTIONS, rules.normalize_surface(m)))
            for m in rules.DEPENDS_RE.findall(text):
                a, b = rules.DEPENDS_SPLIT.split(m, 1)
                triples.add(
                    (
                        rules.normalize_surface(a),
                        rules.PRED_DEPENDS_ON,
                        rules.normalize_surface(b),
                    )
                )
            import re as _re

            for full in _re.findall(rules.TEMPLATE_FULL_PATTERN, text):
                name, params = rules.parse_template(full)
                triples.add((uri, rules.PRED_INVOKES, name))
                for k, v in params:
                    triples.add((uri, rules.PRED_TPL_PARAM, f"{name}|{k}={v}"))
    return triples


def mention_spans_oracle(rows: list[tuple]) -> set[tuple[str, str, int, int]]:
    """(turn_uri, surface, start, end) for every mention triple —
    span semantics defined once in rules.mention_spans."""
    out: set[tuple[str, str, int, int]] = set()
    for conv_id, turn_idx, _role, text, _tool, _ts in rows:
        if not text:
            continue
        uri = rules.turn_uri(conv_id, turn_idx)
        for obj, (s, e) in rules.mention_spans(text).items():
            out.add((uri, obj, s, e))
    return out


def link_oracle(triples: set[tuple[str, str, str]]) -> set[tuple[str, str, str]]:
    """mention surfaces → same_as triples, mirroring Stage B: blocking
    key candidate set, Jaccard on char-3-gram shingles, best pick with
    (score desc, canonical_id, alias) tie-break, threshold."""
    catalog = rules.catalog_rows()  # (qid, alias_norm)
    by_block: dict[str, list[tuple[str, str]]] = {}
    for qid, alias in catalog:
        by_block.setdefault(rules.block_key(alias), []).append((qid, alias))

    out: set[tuple[str, str, str]] = set()
    surfaces = {o for _s, p, o in triples if p == rules.PRED_MENTIONS}
    for surface in surfaces:
        cands = by_block.get(rules.block_key(surface), [])
        sh = rules.char_shingles(surface)
        best = None  # (neg_score, qid, alias)
        for qid, alias in cands:
            score = rules.jaccard(sh, rules.char_shingles(alias))
            key = (-score, qid, alias)
            if best is None or key < best:
                best = key
        if best is not None and -best[0] >= rules.LINK_SCORE_THRESHOLD:
            out.add((surface, rules.PRED_SAME_AS, best[1]))
    return out


def cc_oracle(edges: set[tuple[str, str]]) -> set[tuple[str, str, str]]:
    """Union-find connected components → canonical_of triples with the
    same canonical-id choice as Stage C (min Q_ node, else min node)."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: str, b: str) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra

    for u, v in edges:
        union(u, v)

    comps: dict[str, set[str]] = {}
    for node in parent:
        comps.setdefault(find(node), set()).add(node)

    out: set[tuple[str, str, str]] = set()
    for members in comps.values():
        qids = sorted(m for m in members if m.startswith("Q_"))
        canon = qids[0] if qids else min(members)
        for m in members:
            if m != canon:
                out.add((m, rules.PRED_CANONICAL_OF, canon))
    return out


def full_oracle(rows: list[tuple]) -> set[tuple[str, str, str]]:
    """Full pipeline oracle: extract + link + canonicalize."""
    triples = extract_oracle(rows)
    same_as = link_oracle(triples)
    edges = {(s, o) for s, _p, o in same_as}
    canonical = cc_oracle(edges)
    return triples | same_as | canonical


def precision_recall(
    got: set[tuple], expected: set[tuple]
) -> tuple[float, float]:
    if not got or not expected:
        return (0.0, 0.0)
    tp = len(got & expected)
    return tp / len(got), tp / len(expected)
