"""Admission-routing A/B on real TPU: api.align blended rate at a
config whose e*l prediction flags most pairs past the C=63 primary band
(VERDICT r4 item 4 'Done' = blended rate improves >=2x at SWG 8 kbp
e=1%).  Interleaved in ONE process (tools/_timing protocol).

    python tools/dev_route_ab.py [l [e [n]]]
"""

import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

from aim_tpu.api import align  # noqa: E402
from aim_tpu.config import derive_config  # noqa: E402
from tools import _timing as T  # noqa: E402
from aim_tpu.datagen import generate_pairs  # noqa: E402


def main():
    l = int(sys.argv[1]) if len(sys.argv) > 1 else 8000
    e = float(sys.argv[2]) if len(sys.argv) > 2 else 0.01
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    T.sync_mode()
    cfg = derive_config("swg", l, e, backtrace=True, variant="hbm")
    # canonical workload: the reference generator's planted-error
    # semantics (what route_planes' model predicts)
    pats, txts, pl_, tl_ = generate_pairs(n, l, e,
                                          read_size=cfg.read_size,
                                          seed=9)

    def run_routed():
        os.environ["AIM_TPU_ROUTE"] = "1"
        return align(pats, txts, pl_, tl_, cfg)

    def run_unrouted():
        os.environ["AIM_TPU_ROUTE"] = "0"
        return align(pats, txts, pl_, tl_, cfg)

    # warm both arms (compiles)
    r1 = run_routed()
    r0 = run_unrouted()
    assert np.array_equal(r1.scores, r0.scores), "routing changed scores!"
    print(f"l={l} e={e} n={n}: routed n_retry={r1.n_retry} "
          f"fallback={r1.n_fallback} | unrouted n_retry={r0.n_retry} "
          f"fallback={r0.n_fallback}", flush=True)
    ba, bb, ta, tb = T.interleaved_ab(
        lambda: run_routed().scores, lambda: run_unrouted().scores,
        rounds=int(os.environ.get("AIM_ROUTE_AB_ROUNDS", "4")))
    print(f"routed:   best {ba*1e3:.1f} ms ({n/ba:.0f} pairs/s) {ta}")
    print(f"unrouted: best {bb*1e3:.1f} ms ({n/bb:.0f} pairs/s) {tb}")
    print(f"blended-rate gain: {bb/ba:.2f}x")


if __name__ == "__main__":
    main()
