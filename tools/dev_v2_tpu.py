"""v2 WFA kernel on real TPU: compile check, equality vs oracle, and
marginal us/pair A/B vs the v1 kernel (batch-size scaling in eager mode).

Usage: python tools/dev_v2_tpu.py [n_eq]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

import aim_tpu.native as nat  # noqa: E402
from aim_tpu.config import derive_config  # noqa: E402
from aim_tpu.ops.common import pack_seqs  # noqa: E402
from aim_tpu.ops.wfa_pallas2 import wfa_forward_pallas2  # noqa: E402
from tests.util import cigar_of  # noqa: E402
from tools import _timing as T  # noqa: E402

DATASET = "/root/reference/Datasets/sample-l100-e1-40K"


def main():
    n_eq = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    # eager mode flip (PERFNOTES.md)
    b = jax.device_put(np.zeros(64, np.uint8))
    jax.block_until_ready(b)
    np.asarray(b)

    cfg = derive_config("wfa", 100, 0.01, backtrace=True, adaptive=True)
    print(f"cfg: smax={cfg.max_score} R={cfg.read_size}")
    pats, txts, pl_, tl_ = nat.parse_pairs(DATASET, n_eq, cfg.read_size)
    up, ut, packed = pack_seqs(pats, txts, pl_, tl_, cfg.read_size)
    n = len(pl_)

    def run(fn, m):
        dp = jax.device_put(up[:m])
        dt = jax.device_put(ut[:m])
        dpl = jax.device_put(pl_[:m].astype(np.int32))
        dtl = jax.device_put(tl_[:m].astype(np.int32))
        jax.block_until_ready((dp, dt, dpl, dtl))
        thunk = lambda: fn(dp, dt, dpl, dtl, cfg=cfg, packed=packed)
        best = T.best_of(thunk, repeats=3)
        out = thunk()
        jax.block_until_ready(out)
        return out, best

    # ---- equality: v2 vs oracle on the real dataset ----
    t0 = time.perf_counter()
    out2, _ = run(wfa_forward_pallas2, n)
    print(f"v2 compile+run ok ({time.perf_counter() - t0:.1f}s)")
    recs = np.asarray(out2["step_records"])
    sc, ops, bg, en = nat.wfa_steps_to_ops(recs, pl_, tl_,
                                           max_score=cfg.max_score,
                                           max_ops=2 * cfg.read_size)
    osc, oops, ob, oe = nat.wfa_align(pats, txts, pl_, tl_,
                                      mismatch=3, gap_o=4, gap_e=1,
                                      max_score=cfg.max_score, adaptive=True,
                                      backtrace=True)
    bad = int((sc != osc).sum())
    cbad = 0
    for i in range(n):
        if sc[i] == osc[i] and osc[i] <= cfg.max_score:
            if cigar_of(ops[i], bg[i], en[i]) != cigar_of(oops[i], ob[i],
                                                          oe[i]):
                cbad += 1
                if cbad <= 3:
                    print(" cigar diff at", i)
    print(f"equality on {n} dataset pairs: score_diffs={bad} "
          f"cigar_diffs={cbad}")

    # ---- marginal cost: slope between two batch sizes ----
    for name, fn in (("v2", wfa_forward_pallas2),):
        _, t_small = run(fn, 4096)
        _, t_big = run(fn, 32768 if len(pl_) >= 32768 else n)
        m_big = 32768 if len(pl_) >= 32768 else n
        slope = (t_big - t_small) / (m_big - 4096) * 1e6
        print(f"{name}: t4096={t_small*1e3:.2f}ms t{m_big}={t_big*1e3:.2f}ms"
              f"  marginal={slope:.4f} us/pair")


if __name__ == "__main__":
    main()
