"""GenASM golden — executable spec of the bitvector kernel.

The reference snapshot ships GenASM only as an EMPTY submodule
(ref: .gitmodules:1-3; README.md:29 points at safaad/aim-genasm), so this
framework defines the semantics and anchors them to something externally
checkable: aim-tpu's GenASM is a bounded-edit-distance aligner whose
score is the Levenshtein distance (the reference README: "the alignment
score (edit distance in case of GenASM)", README.md:85) and whose CIGAR
is byte-identical to this repo's NW walker at unit costs
(mismatch=1, gap_i=1, gap_d=1).  Overflow (distance > MAX_SCORE) reports
MAX_SCORE+1 without a CIGAR walk, the framework's WFA convention.

The ALGORITHM here is the GenASM-DC/TB bitvector scheme (Senol Cali et
al., MICRO 2020) reformulated for this data model, and this golden is
the device kernel's executable spec (ops/genasm_pallas.py mirrors it
bit for bit):

  B_d^i = bitvector over pattern-prefix lengths j = 0..plen after
          consuming i text chars; bit j set <=> edit distance of
          (pattern[:j], text[:i]) <= d.
  B_d^i = ((B_d^{i-1} << 1) & PM(t_i))      match (cost 0)
        | (B_{d-1}^{i-1} << 1)              substitution
        |  B_{d-1}^{i-1}                    'I' op (consume text)
        | (B_{d-1}^{i}   << 1)              'D' op (consume pattern)
        | [bit0 = (i <= d)]
  with PM(c) bit j = (pattern[j-1] == c), B_d^0 bit j = (j <= d).

The 'D' term references the CURRENT step's lower-d vector — a prefix
dependency along d that the kernel resolves with log-doubling shifted
ORs; here it is a plain ascending-d loop.

The traceback walks text levels i = tlen..0.  At each level the NW
priority order (D -> I -> diagonal; ref NW walk, nw.c:67-107) folds into
one D-run (bits along the (d-l, j-l) anti-diagonal of B^i stay set
exactly while D keeps winning) plus exactly one text-consuming op.
"""

from __future__ import annotations

import numpy as np


def _bits(plen):
    return plen + 1


def genasm_forward_golden(pattern: bytes, text: bytes, k: int):
    """Returns (dist_or_k+1, B) where B[i][d] is a python int bitvector."""
    p = np.frombuffer(bytes(pattern), np.uint8)
    t = np.frombuffer(bytes(text), np.uint8)
    plen, tlen = len(p), len(t)
    B = [[0] * (k + 1) for _ in range(tlen + 1)]
    for d in range(k + 1):
        B[0][d] = (1 << (min(d, plen) + 1)) - 1
    for i in range(1, tlen + 1):
        pm = 1  # bit 0 (empty pattern) never matches via PM
        for j in range(1, plen + 1):
            if p[j - 1] == t[i - 1]:
                pm |= 1 << j
        prev = B[i - 1]
        cur = B[i]
        for d in range(k + 1):
            v = (prev[d] << 1) & pm
            if d > 0:
                v |= (prev[d - 1] << 1) | prev[d - 1] | (cur[d - 1] << 1)
            if i <= d:
                v |= 1
            cur[d] = v & ((1 << (plen + 1)) - 1)
    dist = None
    for d in range(k + 1):
        if (B[tlen][d] >> plen) & 1:
            dist = d
            break
    return (dist if dist is not None else k + 1), B


def genasm_golden(pattern: bytes, text: bytes, k: int, backtrace=False):
    """Returns (score, cigar_ops_string) — ops as 'M'/'X'/'I'/'D' chars,
    matching the repo NW walker's unit-cost output exactly."""
    dist, B = genasm_forward_golden(pattern, text, k)
    plen, tlen = len(pattern), len(text)
    if not backtrace or dist > k:
        return dist, ""
    p = np.frombuffer(bytes(pattern), np.uint8)
    t = np.frombuffer(bytes(text), np.uint8)

    def bit(i, d, j):
        return d >= 0 and j >= 0 and ((B[i][d] >> j) & 1) == 1

    ops = []
    j, i, d = plen, tlen, dist
    while j > 0 and i > 0:
        # D-run: the NW priority checks D first after every step, and
        # along the run exactness degrades one level per consumed char
        while j > 0 and d > 0 and bit(i, d - 1, j - 1):
            ops.append("D")
            j -= 1
            d -= 1
        if j == 0 or i == 0:
            break
        if d > 0 and bit(i - 1, d - 1, j):
            ops.append("I")
            i -= 1
            d -= 1
        elif p[j - 1] == t[i - 1]:
            ops.append("M")
            i -= 1
            j -= 1
        else:
            ops.append("X")
            i -= 1
            j -= 1
            d -= 1
    while i > 0:
        ops.append("I")
        i -= 1
    while j > 0:
        ops.append("D")
        j -= 1
    return dist, "".join(reversed(ops))
