"""GenASM — long-read tier via the HBM-streamed banded kernel.

This framework's GenASM semantics are anchored to NW at unit costs
(golden/genasm.py: the reference ships GenASM only as an empty submodule,
.gitmodules:1-3), so bounded edit distance beyond the VMEM bit-vector
kernel's gate (k >= 27 or large R) is exactly the unit-cost instance of
the streamed NW long kernel (ops/nwswg_pallas_long.py).  This adapter:

  * runs that kernel with gap_i = gap_d = mismatch = 1;
  * rewrites unflagged scores > k to the GenASM overflow record
    (score k+1, single default-'M' run — the VMEM kernel's and host
    oracle's behavior);
  * patches half-empty pairs: GenASM scores them plen + tlen while the
    NW record reports 0 (the framework-wide padded-pair convention);
    their runs (pure I/D tails) are already correct.

Exactness: for an UNFLAGGED pair the banded NW score is the true edit
distance (the band argument of ops/nwswg_pallas_long.py), so both the
<=k scores and the >k overflow rewrites are certified; flagged pairs
fall back to the exact host GenASM oracle as usual.  The admission cap
k <= 508 keeps balanced pairs below the npl=4 band-flag bound
(dmax = score//2 + 1 <= 255 = C); the primary band escalates with k
(k <= 124: C=63, k <= 252: C=127, else C=255 — _npl), with the wider
ladder stages as retries for band-flagged pairs.  Record capacity
scales with k too (runs_lanes_long: up to 2k+1 runs at unit costs).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
from jax import jit

from aim_tpu.config import ALGO_NW, AlignConfig

from aim_tpu.ops.nwswg_pallas_long import (_nwswg_long_jit, band_c,
                                           long_fit_nwswg,
                                           runs_lanes_long)
from aim_tpu.ops.nwswg_pallas_long import hbm_per_pair as _nwswg_hbm_per_pair

I16 = jnp.int16
I32 = jnp.int32
OP_M = 0


def _nw_cfg(cfg: AlignConfig) -> AlignConfig:
    return AlignConfig(algo=ALGO_NW, read_size=cfg.read_size,
                       max_score=cfg.max_score, backtrace=cfg.backtrace,
                       gap_i=1, gap_d=1, mismatch=1, variant="hbm")


def _npl(cfg: AlignConfig) -> int:
    """Static primary plane count: k <= 124 runs the C=63 band;
    124 < k <= 252 the C=127 band (npl=2); 252 < k <= 508 the C=255
    band (npl=4, TPU-certified in round 5)."""
    for p in (1, 2):
        if cfg.max_score <= 2 * (band_c(p) - 1):
            return p
    return 4


def long_fit_genasm(cfg: AlignConfig) -> bool:
    """Admission: k small enough that balanced pairs pass the band flag
    (score//2 + 1 <= C at the npl=4 band, C=255), sizes within the
    streamed kernel's range."""
    return (cfg.max_score <= 2 * (band_c(4) - 1)
            and long_fit_nwswg(_nw_cfg(cfg)))


def hbm_per_pair(cfg: AlignConfig) -> int:
    return _nwswg_hbm_per_pair(_nw_cfg(cfg))


@functools.partial(jit,
                   static_argnames=("cfg", "interpret", "packed", "npl"))
def _genasm_long_jit(pats, txts, plens, tlens, *, cfg: AlignConfig,
                     interpret: bool = False, packed: bool = False,
                     npl: int = 1):
    k = cfg.max_score
    out = _nwswg_long_jit(pats, txts, plens, tlens, cfg=_nw_cfg(cfg),
                          interpret=interpret, packed=packed, npl=npl)
    runs = out["packed_runs"].astype(I32)
    n = runs.shape[0]
    NRL = runs_lanes_long(_nw_cfg(cfg))
    lane = jnp.arange(NRL, dtype=I32)[None, :]
    score = runs[:, 1:2]
    # bit 9 = SCORE-only uncertainty: a pair whose CIGAR overflowed the
    # record capacity (bit 8) but whose score is certified can still be
    # overflow-rewritten — the rewrite discards the CIGAR anyway.
    sflag = (runs[:, 0:1] >> 9) & 1
    pl_ = plens.astype(I32)[:, None]
    tl_ = tlens.astype(I32)[:, None]
    half_empty = ((pl_ == 0) ^ (tl_ == 0))
    score = jnp.where(half_empty, pl_ + tl_, score)
    runs = jnp.where((lane == 1) & half_empty, score, runs)

    # GenASM overflow: certified score > k -> k+1 with one default-M
    # run.  The rewrite cursor (NRL - 2) uses the lane0 split encoding
    # (low 8 bits at 0-7, high bits at 10+ — nwswg_pallas_long grammar).
    over = (score > k) & (sflag == 0)
    cur = NRL - 2
    cur_enc = (cur & 255) | ((cur >> 8) << 10)
    over_row = jnp.where(lane == 0, cur_enc,
                         jnp.where(lane == 1, k + 1,
                                   jnp.where(lane == NRL - 1,
                                             (OP_M << 12) | 1, 0)))
    runs = jnp.where(over, jnp.broadcast_to(over_row, (n, NRL)), runs)
    return {"packed_runs": runs.astype(I16)}


def genasm_forward_pallas_long(pats, txts, plens, tlens, *,
                               cfg: AlignConfig, interpret: bool = False,
                               packed: bool = False, planes: int | None = None):
    """GenASM long-read forward (+ on-device traceback).  Same
    {"packed_runs"} record contract as the NW/SWG kernels.  planes
    defaults to the k-derived count (_npl); passing 2 forces the wide
    band (api.align's flagged-pair retry)."""
    return _genasm_long_jit(pats, txts, plens, tlens, cfg=cfg,
                            interpret=interpret, packed=packed,
                            npl=_npl(cfg) if planes is None else planes)


genasm_forward_pallas_long.supports_packed = True
genasm_forward_pallas_long.out_key = "packed_runs"
