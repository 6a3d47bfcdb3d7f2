"""jplace semantic diff -- the acceptance oracle for placement parity.

Port of the reference's comparison semantics
(reference: scripts/jplace_diff.py):

* records are keyed by sequence name via the ``n``/``nm`` fields
  (jplace_diff.py:129-133);
* a sequence matches if the *score sets* are almost-equal ignoring edges
  (jplace_diff.py:203-207), or per-edge over the union of edges
  ``abs(10**ll1 - 10**ll2) <= 1e-4`` -- probability space, epsilon 1e-4
  (jplace_diff.py:21,222);
* ``--only-best`` compares the best edge only (jplace_diff.py:160-172).
"""

from __future__ import annotations

import dataclasses
import json

__all__ = ["EPSILON", "DiffResult", "parse_jplace", "jplace_diff", "main"]

EPSILON = 1e-4


@dataclasses.dataclass
class DiffResult:
    num_seqs: int
    num_matches: int
    mismatches: list[str]

    @property
    def clean(self) -> bool:
        return self.num_matches == self.num_seqs


def parse_jplace(path: str) -> dict[str, list[tuple[int, float]]]:
    """name -> [(edge_num, likelihood), ...] using the "fields" indirection
    (reference: jplace_diff.py:96-133)."""
    with open(path) as f:
        content = json.load(f)
    assert "fields" in content, f'{path} must contain "fields"'
    fields = content["fields"]
    for required in ("edge_num", "likelihood"):
        assert required in fields, f"fields must declare edge_num and likelihood"
    ei = fields.index("edge_num")
    li = fields.index("likelihood")
    assert "placements" in content, f'{path} must have the "placements" section'
    out: dict[str, list[tuple[int, float]]] = {}
    for pd in content["placements"]:
        rows = [(int(p[ei]), float(p[li])) for p in pd["p"]]
        names = pd["n"] if "n" in pd else [nm[0] for nm in pd["nm"]]
        for name in names:
            out[name] = rows
    return out


def _set_almost_equals(a: set[float], b: set[float], epsilon: float = EPSILON) -> bool:
    """reference: jplace_diff.py:145-158."""
    if len(a) != len(b):
        return False
    la, lb = sorted(a), sorted(b)
    return all(abs(x - y) <= epsilon for x, y in zip(la, lb))


def jplace_diff(path1: str, path2: str, only_best: bool = False) -> DiffResult:
    p1 = parse_jplace(path1)
    p2 = parse_jplace(path2)
    mismatches: list[str] = []
    num_matches = 0
    for name, rows1 in p1.items():
        if name not in p2:
            mismatches.append(f"{name}: missing from {path2}")
            continue
        rows2 = p2[name]
        if only_best:
            if not rows1 and not rows2:
                num_matches += 1
            elif rows1 and rows2 and rows1[0][0] == rows2[0][0]:
                num_matches += 1
            else:
                mismatches.append(f"{name}: best edge differs")
            continue
        scores1 = set(ll for _, ll in rows1)
        scores2 = set(ll for _, ll in rows2)
        if _set_almost_equals(scores1, scores2):
            num_matches += 1
            continue
        rec1 = dict(rows1)
        rec2 = dict(rows2)
        bad = False
        for edge in set(rec1) | set(rec2):
            if edge not in rec1:
                mismatches.append(f"{name}: {edge} is not in the first file")
                bad = True
            elif edge not in rec2:
                mismatches.append(f"{name}: {edge} is not in the second file")
                bad = True
            elif abs(10.0 ** rec1[edge] - 10.0 ** rec2[edge]) > EPSILON:
                mismatches.append(f"{name}: [{edge}] {rec1[edge]} != {rec2[edge]}")
                bad = True
        if not bad:
            num_matches += 1
    return DiffResult(num_seqs=len(p1), num_matches=num_matches, mismatches=mismatches)


def main(argv: list[str] | None = None) -> int:
    import argparse

    ap = argparse.ArgumentParser(description="Semantic diff of two jplace files")
    ap.add_argument("jplace1")
    ap.add_argument("jplace2")
    ap.add_argument("--only-best", action="store_true", default=False)
    args = ap.parse_args(argv)
    res = jplace_diff(args.jplace1, args.jplace2, only_best=args.only_best)
    for m in res.mismatches[:200]:
        print(m)
    print(f"\n{res.num_matches}/{res.num_seqs} placements match.")
    return 0 if res.clean else 1


if __name__ == "__main__":
    raise SystemExit(main())
