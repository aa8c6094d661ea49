#!/usr/bin/env python3
"""Deterministic two-view TSV matrix fixtures for the §3.3 report.

The same generator backs two shapes:
- the per-round bench fixture (1,024 + 256 features × 400 samples —
  wide enough that raw_gene routes through the Arrow NB scorer, small
  enough to time every round), and
- the full reference width (20,531 + 1,046 × 1,866, the
  TCGA_Data/labels.csv class mix) when the bench budget allows —
  the same shape tests/test_report_full_width.py asserts goldens at.

Values are 2-decimal fixed-point (parse to identical doubles in every
reader); generation streams feature blocks so the 40M-cell full-width
file never materializes in memory.
"""

from __future__ import annotations

import os

import numpy as np

# bench fixture: 3-class mix, 300 samples; d1 > 256 keeps raw_gene /
# raw_concat on the Arrow NB route while the whole 12-set report fits
# a per-round bench slot (~60 s at local[32])
BENCH_MIX = (("alpha", 135), ("beta", 98), ("gamma", 67))
BENCH_D1, BENCH_D2 = 512, 128

# the reference's exact class mix (TCGA_Data/labels.csv — 1,866 rows)
FULL_MIX = (
    ("breast", 621), ("liver", 367), ("lung", 341),
    ("sarcoma", 257), ("kidney", 183), ("melanoma", 97),
)
FULL_D1, FULL_D2 = 20_531, 1_046


def _cell(f: np.ndarray, s: np.ndarray, off: int) -> np.ndarray:
    return ((f * 131 + s * 17 + off) % 1000) / 100.0


def write_views(out_dir: str, d1: int, d2: int, mix) -> tuple[str, str]:
    """Write (gene.tsv, mirna.tsv) under out_dir; reuse if present."""
    p1 = os.path.join(out_dir, "gene.tsv")
    p2 = os.path.join(out_dir, "mirna.tsv")
    if os.path.exists(p1) and os.path.exists(p2):
        return p1, p2
    os.makedirs(out_dir, exist_ok=True)
    n = sum(c for _, c in mix)
    labels = [lab for lab, c in mix for _ in range(c)]
    # deterministic interleave so classes are not contiguous blocks
    order = sorted(range(n), key=lambda j: (j * 2654435761) % n)
    sample_ids = [f"{labels[order[j]]}.S{j:04d}" for j in range(n)]
    s_idx = np.arange(n)

    def write(path: str, n_feat: int, off: int) -> None:
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            fh.write("feature\t" + "\t".join(sample_ids) + "\n")
            block = 512  # stream blocks: never hold all cells at once
            for f0 in range(0, n_feat, block):
                f_idx = np.arange(f0, min(f0 + block, n_feat))
                vals = _cell(f_idx[:, None], s_idx[None, :], off)
                lines = [
                    f"g{f}\t" + "\t".join(f"{v:.2f}" for v in vals[i])
                    for i, f in enumerate(f_idx)
                ]
                fh.write("\n".join(lines) + "\n")
        os.replace(tmp, path)

    write(p1, d1, 0)
    write(p2, d2, 7)
    return p1, p2


if __name__ == "__main__":
    import sys

    out = sys.argv[1] if len(sys.argv) > 1 else ".benchdata/report_fixture"
    full = len(sys.argv) > 2 and sys.argv[2] == "full"
    if full:
        print(write_views(out, FULL_D1, FULL_D2, FULL_MIX))
    else:
        print(write_views(out, BENCH_D1, BENCH_D2, BENCH_MIX))
