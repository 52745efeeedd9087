"""N-way line alignment + voting (the `cor-asv-ann-align` capability).

Semantics follow /root/reference/ocrd_cor_asv_ann/wrapper/align.py:100-245:
pairwise character alignments between all inputs, a min-total-distance
permutation (brute-force over ≤ a handful of OCR engines), progressive
expansion into alignment columns of per-input alternatives, then a
per-column vote:

* ``majority``   — most frequent alternative (conf = max conf among the
  winners);
* ``confidence`` — highest-confidence alternative;
* ``combined``   — alternative with the highest summed confidence.

Implementation is an independent progressive-alignment design (columns
keyed by the first-placed sequence, per-char difflib pairings), not a
transcription of the reference's in-place expansion loop.
"""

from __future__ import annotations

import itertools

from .align import GAP, adjusted_distance, best_alignment


def _pairwise_distances(seqs: list[str]) -> dict[tuple[int, int], float]:
    dists = {}
    for i, j in itertools.combinations(range(len(seqs)), 2):
        d, _ = adjusted_distance(seqs[i], seqs[j])
        dists[(i, j)] = dists[(j, i)] = d
    return dists


def best_order(seqs: list[str]) -> list[int]:
    """Min-total-distance permutation (TSP over ≤ N inputs, N small)."""
    n = len(seqs)
    if n <= 2:
        return list(range(n))
    dists = _pairwise_distances(seqs)
    best, best_cost = None, float("inf")
    for perm in itertools.permutations(range(n)):
        if perm[0] > perm[-1]:
            continue  # symmetric
        cost = sum(dists[(a, b)] for a, b in zip(perm, perm[1:]))
        if cost < best_cost:
            best, best_cost = perm, cost
    return list(best)


def align_columns(
    seqs: list[str], confs: list[list[float]] | None = None
) -> list[tuple[list[str], list[float]]]:
    """Progressively align all sequences into columns. Returns a list of
    (alternatives, confidences), each of length n_inputs; inputs without
    a character at a column hold '' (conf 1.0, reference default)."""
    n = len(seqs)
    if confs is None:
        confs = [[1.0] * len(s) for s in seqs]
    order = best_order(seqs)
    base = order[0]
    cols: list[list] = []  # [alts per input, confs per input]
    col_of: dict[int, list[int]] = {}
    col_of[base] = []
    for pos, ch in enumerate(seqs[base]):
        cols.append([[""] * n, [1.0] * n])
        cols[-1][0][base] = ch
        cols[-1][1][base] = confs[base][pos]
        col_of[base].append(pos)
    if not cols:  # empty base line
        cols.append([[""] * n, [1.0] * n])
        col_of[base] = []
    for i, j in zip(order, order[1:]):
        pairs = best_alignment(seqs[i], seqs[j])
        pos_i = pos_j = 0
        col_map_i = col_of[i]
        col_of[j] = [0] * len(seqs[j])
        last_col = 0
        for s, t in pairs:
            s_len = len(s) if isinstance(s, str) and s != GAP else 0
            t_len = len(t) if isinstance(t, str) and t != GAP else 0
            if s != GAP and s_len:
                col = col_map_i[pos_i] if pos_i < len(col_map_i) else len(cols) - 1
                # multi-char source symbols (grapheme recombination) span
                # one column per original char; anchor at the first
                for k in range(s_len):
                    if pos_i + k < len(col_map_i):
                        col = max(col, col_map_i[pos_i])  # keep first anchor
                pos_i += s_len
                last_col = col
                if t != GAP and t_len:
                    if cols[col][0][j]:
                        cols[col][0][j] += t
                        cols[col][1][j] = (cols[col][1][j] + _avg(confs[j], pos_j, t_len)) / 2
                    else:
                        cols[col][0][j] = t
                        cols[col][1][j] = _avg(confs[j], pos_j, t_len)
                    for k in range(t_len):
                        if pos_j + k < len(col_of[j]):
                            col_of[j][pos_j + k] = col
                    pos_j += t_len
            elif t != GAP and t_len:
                # insertion on j's side: attach to the previous column
                col = last_col
                cols[col][0][j] += t
                cols[col][1][j] = _avg(confs[j], pos_j, t_len) if not cols[col][0][j][:-t_len] else cols[col][1][j]
                for k in range(t_len):
                    if pos_j + k < len(col_of[j]):
                        col_of[j][pos_j + k] = col
                pos_j += t_len
    return [(c[0], c[1]) for c in cols]


def _avg(conf: list[float], start: int, n: int) -> float:
    seg = conf[start : start + n]
    return sum(seg) / len(seg) if seg else 1.0


def vote(
    columns: list[tuple[list[str], list[float]]], method: str = "majority"
) -> tuple[str, float]:
    """Per-column vote → (merged text, mean confidence)."""
    text = []
    confs = []
    for alts, cs in columns:
        if method == "majority":
            counts = [alts.count(a) for a in alts]
            m = max(counts)
            best = counts.index(m)
            text.append(alts[best])
            confs.append(max(c for cnt, c in zip(counts, cs) if cnt == m))
        elif method == "confidence":
            best = max(range(len(cs)), key=lambda k: cs[k])
            text.append(alts[best])
            confs.append(cs[best])
        else:  # combined: summed confidence per candidate string
            scores: dict[str, float] = {}
            for a, c in zip(alts, cs):
                scores[a] = scores.get(a, 0.0) + c
            winner = max(scores, key=lambda a: scores[a])
            text.append(winner)
            confs.append(max(c for a, c in zip(alts, cs) if a == winner))
    return "".join(text), (sum(confs) / len(confs) if confs else 1.0)


def align_and_vote(
    seqs: list[str],
    confs: list[list[float]] | None = None,
    method: str = "majority",
) -> tuple[str, float]:
    seqs = [s for s in seqs if s is not None]
    if not seqs:
        return "", 1.0
    if len(seqs) == 1:
        c = confs[0] if confs else [1.0]
        return seqs[0], sum(c) / len(c) if c else 1.0
    return vote(align_columns(seqs, confs), method)
