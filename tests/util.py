"""Shared test helpers: synthetic pair generation and packing."""

from __future__ import annotations

import random

import numpy as np

BASES = "ACGT"


def make_pair(rng: random.Random, plen: int, tlen: int, nerr: int,
              alphabet: str = BASES):
    p = [rng.choice(alphabet) for _ in range(plen)]
    t = (list(p[:tlen]) if tlen <= plen
         else p + [rng.choice(alphabet) for _ in range(tlen - plen)])[:tlen]
    for _ in range(nerr):
        if not t:
            break
        r = rng.random()
        if r < 0.6:
            t[rng.randrange(len(t))] = rng.choice(alphabet)
        elif r < 0.8 and len(t) > 2:
            del t[rng.randrange(len(t))]
        else:
            t.insert(rng.randrange(len(t) + 1), rng.choice(alphabet))
    return "".join(p), "".join(t)


def random_pairs(seed: int, n: int, max_len: int, balanced=True,
                 alphabet: str = BASES):
    """Random pairs; includes plen == tlen+1 (tape-aliasing) cases.
    A >4-symbol alphabet (e.g. "ACGTN") defeats 2-bit packing and
    exercises the byte-comparing device tiers / packed_ok re-dispatch."""
    rng = random.Random(seed)
    pairs = []
    for _ in range(n):
        plen = rng.randrange(3, max_len - 3)
        d = rng.choice([-1, -1, 0, 0, 0, 0, 1, 1] if balanced
                       else [-4, -2, -1, 0, 1, 2, 4])
        tlen = max(1, min(max_len, plen + d))
        pairs.append(make_pair(rng, plen, tlen, rng.randrange(0, 4),
                               alphabet))
    return pairs


def pack(pairs, read_size: int):
    n = len(pairs)
    pats = np.zeros((n, read_size), np.uint8)
    txts = np.zeros((n, read_size), np.uint8)
    pl = np.zeros(n, np.int32)
    tl = np.zeros(n, np.int32)
    for i, (p, t) in enumerate(pairs):
        pats[i, :len(p)] = np.frombuffer(p.encode(), np.uint8)
        txts[i, :len(t)] = np.frombuffer(t.encode(), np.uint8)
        pl[i] = len(p)
        tl[i] = len(t)
    return pats, txts, pl, tl


def write_pair_file(path, pairs):
    with open(path, "w") as f:
        for p, t in pairs:
            f.write(f">{p}\n<{t}\n")


def cigar_of(ops_row, b, e) -> bytes:
    return ops_row[b:e].tobytes()
