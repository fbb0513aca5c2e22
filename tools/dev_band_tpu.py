"""NW/SWG banded kernels on real TPU: exactness + marginal rate at the
canonical l=100 e=1% config (batch-scaling slope removes fixed dispatch
cost; inputs are pre-packed and device-resident — PERFNOTES.md).

Usage: python tools/dev_band_tpu.py [n_small [n_big]]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

import aim_tpu.native as nat  # noqa: E402
from aim_tpu.api import _ensure_eager_dispatch  # noqa: E402
from aim_tpu.config import derive_config  # noqa: E402
from aim_tpu.ops.nw_pallas import nw_forward_pallas  # noqa: E402
from aim_tpu.ops.swg_pallas import swg_forward_pallas  # noqa: E402
from tests.util import cigar_of  # noqa: E402
from tools.dev_long_check import synth  # noqa: E402
from tools import _timing as T  # noqa: E402


def bench_algo(algo, fwd, n1, n2, oracle):
    cfg = derive_config(algo, 100, 0.01, backtrace=True)
    pats, txts, pl_, tl_ = synth(n2, 100, 0.01, cfg.read_size, seed=3)
    dp, dt = jax.device_put(pats), jax.device_put(txts)
    dpl = jax.device_put(pl_.astype(np.int32))
    dtl = jax.device_put(tl_.astype(np.int32))
    jax.block_until_ready((dp, dt, dpl, dtl))

    def run(n):
        thunk = lambda: fwd(dp[:n], dt[:n], dpl[:n], dtl[:n], cfg=cfg)
        best = T.best_of(thunk, repeats=4)
        out = thunk()
        jax.block_until_ready(out)
        return best, out

    t1, _ = run(n1)
    t2, out = run(n2)
    marg = (t2 - t1) / (n2 - n1) * 1e6
    runs = np.asarray(out["packed_runs"])
    sc = runs[:, 1].astype(np.int32)
    fb = ((runs[:, 0].astype(np.int32) >> 8) & 1).astype(bool)
    osc, oops, ob, oe = oracle(pats, txts, pl_, tl_, cfg)
    wops, wb, we = nat.wfa_runs_to_ops(runs, sc, pl_, tl_,
                                       max_score=1 << 30,
                                       max_ops=2 * cfg.read_size)
    sb = cb = 0
    for i in range(n2):
        if fb[i]:
            continue
        if sc[i] != osc[i]:
            sb += 1
        elif cigar_of(oops[i], ob[i], oe[i]) != \
                cigar_of(wops[i], wb[i], we[i]):
            cb += 1
    print(f"{algo}: marginal={marg:.4f} us/pair  flagged={int(fb.sum())} "
          f"score_bad={sb} cigar_bad={cb}  (t[{n1}]={t1*1e3:.1f}ms "
          f"t[{n2}]={t2*1e3:.1f}ms)", flush=True)
    return sb + cb


def main():
    n1 = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    n2 = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
    _ensure_eager_dispatch()
    bad = 0
    bad += bench_algo(
        "nw", nw_forward_pallas, n1, n2,
        lambda p, t, pl_, tl_, cfg: nat.nw_align(
            p, t, pl_, tl_, mismatch=3, gap_i=4, gap_d=4, backtrace=True))
    bad += bench_algo(
        "swg", swg_forward_pallas, n1, n2,
        lambda p, t, pl_, tl_, cfg: nat.swg_align(
            p, t, pl_, tl_, match=0, mismatch=3, gap_o=4, gap_e=1,
            max_score=cfg.max_score, cell_width=cfg.cell_width,
            backtrace=True))
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
