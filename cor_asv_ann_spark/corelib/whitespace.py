"""Stitch a corrected line string back onto its span sequence.

Re-expresses the semantics of the reference's `_update_sequence`
(/root/reference/ocrd_cor_asv_ann/wrapper/transcode.py:377-486): given the
concatenated input line, a corrected output line, and a monotonic
alignment path mapping input offsets to output offsets, cut the output
into per-span segments at the mapped span starts, then redistribute
characters across neighbouring spans so that

* artificial whitespace spans only ever hold whitespace (or become
  empty → the surrounding words would merge), and
* non-whitespace spans never start/end with whitespace (space allowed
  only in the middle → the word would split).

Rules (input: N = non-whitespace span, W = whitespace span)::

    input:  N|    W    |N   N|     W   |   W|    N    |W
    output:  |<-N W N->|     |<-W<-N W |    |<-W N W->|

All functions are pure and operate on plain lists so they can run inside
an Arrow-batched pandas UDF and be property-tested without Spark.
"""

from __future__ import annotations

def nw_char_path(source: str, target: str) -> dict[int, int]:
    """Needleman-Wunsch minimal-edit path as an input-offset → output-offset
    map — the reference keeps the same NW fallback next to its attention
    Viterbi (transcode.py:351-375). Whitespace is anchored (space↔non-space
    costs extra) so word boundaries survive repeated-word lines, and ties
    prefer substitution so corrections map positionally."""
    n, m = len(source), len(target)
    WS = {" ", "\n"}
    # DP over full matrix with backpointers; lines are short (≤ a few
    # hundred chars) so O(n·m) per line is fine inside the Arrow batch.
    INF = 1 << 30
    cost = [[0] * (m + 1) for _ in range(n + 1)]
    back = [[0] * (m + 1) for _ in range(n + 1)]  # 0=diag 1=up(del) 2=left(ins)
    for j in range(1, m + 1):
        cost[0][j] = j
        back[0][j] = 2
    for i in range(1, n + 1):
        cost[i][0] = i
        back[i][0] = 1
        si = source[i - 1]
        row, prow = cost[i], cost[i - 1]
        brow = back[i]
        for j in range(1, m + 1):
            tj = target[j - 1]
            if si == tj:
                sub = 0
            elif (si in WS) != (tj in WS):
                sub = 2  # don't pair whitespace with content
            else:
                sub = 1
            d = prow[j - 1] + sub
            u = prow[j] + 1
            l = row[j - 1] + 1
            best = d
            op = 0
            if u < best:
                best, op = u, 1
            if l < best:
                best, op = l, 2
            row[j] = best
            brow[j] = op
    path = {}
    i, j = n, m
    path[i] = j
    while i > 0 or j > 0:
        op = back[i][j]
        if op == 0:
            i -= 1
            j -= 1
        elif op == 1:
            i -= 1
        else:
            j -= 1
        # record the smallest j seen for each i (offset *before* consuming)
        path[i] = j
    return path


def alignment_path(source: str, target: str) -> dict[int, int]:
    """Monotonic map from every source offset (0..len(source)) to the
    target offset reached at that point of the best alignment — the role
    of the reference's Viterbi `_alignment2path` (transcode.py:279-349)
    for correctors that don't expose soft attention.

    Fast paths: identity, and space-count-preserving corrections (then
    tokens align 1:1 and only changed tokens need the char DP)."""
    if source == target:
        return {i: i for i in range(len(source) + 1)}
    s_toks, t_toks = source.split(" "), target.split(" ")
    if len(s_toks) == len(t_toks):
        path: dict[int, int] = {0: 0}
        i = j = 0
        for k, (a, b) in enumerate(zip(s_toks, t_toks)):
            if a == b:
                for off in range(len(a)):
                    path[i + off] = j + off
            else:
                sub = nw_char_path(a, b)
                for off, joff in sub.items():
                    path[i + off] = j + joff
            i += len(a)
            j += len(b)
            path[i] = j
            if k + 1 < len(s_toks):  # the separating space maps 1:1
                i += 1
                j += 1
                path[i] = j
        return path
    return nw_char_path(source, target)


def segment_output(
    span_texts: list[str],
    is_ws: list[bool],
    output_line: str,
    output_conf: list[float] | None = None,
    path: dict[int, int] | None = None,
    locked: list[bool] | None = None,
) -> tuple[list[str], list[float]]:
    """Cut ``output_line`` into one segment per input span and apply the
    whitespace-redistribution rules. Returns (new_texts, new_confs) of the
    same length as ``span_texts``; conf is the mean output probability of
    the span's segment (1.0 when empty).

    ``locked`` marks spans that must come out exactly as they went in
    (media anchors riding along in the line): any output the alignment
    lands on them is pushed to the following span."""
    input_line = "".join(span_texts)
    if path is None:
        path = alignment_path(input_line, output_line)
    starts = []
    pos = 0
    for t in span_texts:
        starts.append(pos)
        pos += len(t)
    i_max, j_max = len(input_line), len(output_line)
    if output_conf is None:
        output_conf = [1.0] * j_max

    # map each span start to an output offset (missing ⇒ deleted ⇒ carry j)
    bounds = []
    last_j = 0
    for i in starts + [i_max]:
        j = path.get(i, last_j)
        bounds.append(j)
        last_j = j

    texts = [output_line[bounds[k] : bounds[k + 1]] for k in range(len(span_texts))]

    n = len(texts)
    if locked is not None:
        for k in range(n):
            if locked[k] and texts[k]:
                if k + 1 < n:
                    texts[k + 1] = texts[k] + texts[k + 1]
                elif k > 0:
                    texts[k - 1] += texts[k]
                texts[k] = ""
    def left_of(k: int) -> int:
        j = k - 1
        while j >= 0 and locked is not None and locked[j]:
            j -= 1
        return j

    def right_of(k: int) -> int:
        j = k + 1
        while j < n and locked is not None and locked[j]:
            j += 1
        return j

    for k in range(n):
        out = texts[k]
        if locked is not None and locked[k]:
            continue
        lk, rk = left_of(k), right_of(k)
        if is_ws[k]:
            # LHS: leading non-whitespace belongs to the previous span
            if out and not out.startswith((" ", "\n")) and lk >= 0:
                while out and not out.startswith((" ", "\n")):
                    texts[lk] += out[0]
                    out = out[1:]
            # RHS: trailing word belongs to the next span
            if out and not out.endswith((" ", "\n")) and rk < n:
                tail = len(out.split(" ")[-1])
                texts[rk] = out[-tail:] + texts[rk]
                out = out[:-tail]
            # middle: any remaining non-whitespace goes left
            if out.split() and lk >= 0:
                while out.split():
                    texts[lk] += out[0]
                    out = out[1:]
            elif out.split() and rk < n:
                # line-initial whitespace span with no left neighbour
                # (model correctors can produce this): push right instead
                # so the invariant below still holds
                tail = out.lstrip(" ")
                texts[rk] = tail + texts[rk]
                out = out[: len(out) - len(tail)]
        else:
            # LHS: leading spaces belong to a preceding whitespace span
            if out.startswith(" ") and lk >= 0 and is_ws[lk]:
                while out.startswith(" "):
                    texts[lk] += out[0]
                    out = out[1:]
            # RHS: trailing whitespace belongs to a following whitespace span
            if out.endswith((" ", "\n")) and rk < n and is_ws[rk]:
                while out.endswith((" ", "\n")):
                    texts[rk] = out[-1] + texts[rk]
                    out = out[:-1]
        texts[k] = out

    # confidences: recut against final segment lengths
    confs = []
    pos = 0
    for t in texts:
        seg = output_conf[pos : pos + len(t)] if t else []
        confs.append(float(sum(seg) / len(seg)) if seg else 1.0)
        pos += len(t)

    # invariant from the reference (transcode.py:480-485): no
    # non-whitespace content may be left stranded in a whitespace span.
    for k, t in enumerate(texts):
        assert not (is_ws[k] and t.split()), (
            f"output {t!r} would be lost at whitespace span {k}"
        )
    return texts, confs
