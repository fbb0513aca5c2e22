"""Long-read WFA kernel on real TPU: equality + rate at 1 kbp and 10 kbp.

Usage: python tools/dev_long_tpu.py [n10k]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

import aim_tpu.native as nat  # noqa: E402
from aim_tpu.config import derive_config  # noqa: E402
from aim_tpu.ops.wfa_pallas2 import vmem_fit2  # noqa: E402
from aim_tpu.ops.wfa_pallas_long import long_fit, wfa_forward_pallas_long  # noqa: E402
from tests.util import cigar_of  # noqa: E402
from tools.dev_long_check import synth  # noqa: E402
from tools import _timing as T  # noqa: E402


def run_case(l, e, n, seed):
    cfg = derive_config("wfa", l, e, backtrace=True, adaptive=True,
                        variant="hbm")
    print(f"l={l} e={e}: smax={cfg.max_score} R={cfg.read_size} "
          f"vmem_fit2={vmem_fit2(cfg)} long_fit={long_fit(cfg)}", flush=True)
    pats, txts, pl_, tl_ = synth(n, l, e, cfg.read_size, seed=seed)
    # pack on host + upload ONCE: the timed region must not include the
    # relay H2D (it dominates everything at these read lengths)
    from aim_tpu.ops.common import pack_seqs
    pp, pt, ok = pack_seqs(pats, txts, pl_, tl_, cfg.read_size)
    assert ok
    dp, dt = jax.device_put(pp), jax.device_put(pt)
    dpl, dtl = jax.device_put(pl_), jax.device_put(tl_)
    jax.block_until_ready((dp, dt, dpl, dtl))
    t0 = time.perf_counter()
    out = wfa_forward_pallas_long(dp, dt, dpl, dtl, cfg=cfg, packed=True)
    jax.block_until_ready(out)
    t_compile = time.perf_counter() - t0
    best = T.best_of(
        lambda: wfa_forward_pallas_long(dp, dt, dpl, dtl, cfg=cfg,
                                        packed=True),
        repeats=3, warmup=False)
    recs = np.asarray(out["step_records"])
    sc, ops, b, en = nat.wfa_steps_to_ops(recs, pl_, tl_,
                                          max_score=cfg.max_score,
                                          max_ops=2 * cfg.read_size)
    t0 = time.perf_counter()
    osc, oops, ob, oe = nat.wfa_align(pats, txts, pl_, tl_,
                                      mismatch=3, gap_o=4, gap_e=1,
                                      max_score=cfg.max_score, adaptive=True,
                                      backtrace=True, threads=1)
    t_cpu = time.perf_counter() - t0
    bad = int((sc != osc).sum())
    cbad = 0
    for i in range(n):
        if sc[i] == osc[i] and osc[i] <= cfg.max_score:
            if cigar_of(ops[i], b[i], en[i]) != cigar_of(oops[i], ob[i],
                                                         oe[i]):
                cbad += 1
    print(f"  n={n}: score_diffs={bad} cigar_diffs={cbad} "
          f"tpu={best*1e3:.1f}ms ({best/n*1e6:.1f} us/pair) "
          f"cpu_1t={t_cpu/n*1e6:.1f} us/pair "
          f"compile={t_compile:.1f}s", flush=True)
    return bad + cbad


def main():
    b = jax.device_put(np.zeros(64, np.uint8))
    jax.block_until_ready(b)
    np.asarray(b)
    n10k = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    total = 0
    total += run_case(1000, 0.02, 256, 11)    # smax=100: beyond the VMEM tier
    total += run_case(10000, 0.01, n10k, 12)  # the reference's 10 kbp class
    print("TOTAL:", total)
    sys.exit(1 if total else 0)


if __name__ == "__main__":
    main()
