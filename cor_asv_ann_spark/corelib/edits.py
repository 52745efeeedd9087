"""Mergeable edit-rate statistics (corpus CER/WER accumulator).

Same mathematical object as the reference's Edits accumulator
(/root/reference/ocrd_cor_asv_ann/lib/alignment.py:366-459): a
length-weighted streaming mean + variance of per-line error rates using
the Chan et al. (1979) pairwise update — which is *exactly* Spark's
partial+final aggregation contract, so the distributed version is a plain
``groupBy().agg()`` (see operators/evaluate.py). This pure version exists
to prove numerical parity between the two routes (the reference asserts
the same cross-check in tests/test_all.py:267-271).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class EditStats:
    length: int = 0  # total weight (chars or words)
    steps: int = 0  # number of lines merged
    mean: float = 0.0  # weighted mean error rate
    varia: float = 0.0  # weighted variance of error rate
    hist1: dict = field(default_factory=dict)
    hist2: dict = field(default_factory=dict)
    worst: list = field(default_factory=list)  # [(cost, name, rate, length)]

    def update(self, steps: int, length: int, mean: float, varia: float) -> None:
        if length < 1:
            return
        self.steps += steps
        delta = mean - self.mean
        total = length + self.length
        self.mean = (length * mean + self.length * self.mean) / total
        self.varia = (
            length * varia + self.length * self.varia + delta**2 * length * self.length / total
        )
        self.length += length
        self.varia /= self.length

    def add(self, dist: float, length: int, seq1="", seq2="", name: str = "") -> None:
        rate = dist / length if length else 0.0
        for tok in seq1:
            self.hist1[tok] = self.hist1.get(tok, 0) + 1
        for tok in seq2:
            self.hist2[tok] = self.hist2.get(tok, 0) + 1
        self.update(1, length, rate, 0.0)
        self.worst.append((-rate * length, name, rate, length))
        self.worst.sort()
        self.worst = self.worst[: max(int(self.steps * 0.01), 10)]

    def merge(self, other: "EditStats") -> None:
        self.update(other.steps, other.length, other.mean, other.varia)
        for tok, n in other.hist1.items():
            self.hist1[tok] = self.hist1.get(tok, 0) + n
        for tok, n in other.hist2.items():
            self.hist2[tok] = self.hist2.get(tok, 0) + n
        self.worst = sorted(self.worst + other.worst)[: max(int(self.steps * 0.01), 10)]

    def hist(self) -> dict:
        keys = sorted(set(self.hist1) | set(self.hist2))
        return {k: (self.hist1.get(k, 0), self.hist2.get(k, 0)) for k in keys}
