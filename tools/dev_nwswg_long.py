"""Dev loop for the NW/SWG long-read (HBM-streamed) kernel.

Modes:
  JAX_PLATFORMS=cpu python tools/dev_nwswg_long.py quick   # interpret, small
  JAX_PLATFORMS=cpu python tools/dev_nwswg_long.py 4k      # interpret, 4 kbp
  python tools/dev_nwswg_long.py tpu [l]                   # real TPU, timed
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import aim_tpu.native as nat  # noqa: E402
from aim_tpu.config import AlignConfig  # noqa: E402
from aim_tpu.ops.nwswg_pallas_long import (long_fit_nwswg,  # noqa: E402
                                           nwswg_forward_pallas_long)
from tests.util import cigar_of, make_pair, pack, random_pairs  # noqa: E402
from tools.dev_long_check import synth  # noqa: E402
from tools import _timing as T  # noqa: E402


def oracle(cfg, pats, txts, pl_, tl_):
    if cfg.algo == "nw":
        return nat.nw_align(pats, txts, pl_, tl_, mismatch=cfg.mismatch,
                            gap_i=cfg.gap_i, gap_d=cfg.gap_d,
                            backtrace=cfg.backtrace)
    return nat.swg_align(pats, txts, pl_, tl_, match=cfg.match,
                         mismatch=cfg.mismatch, gap_o=cfg.gap_o,
                         gap_e=cfg.gap_e, max_score=cfg.max_score,
                         cell_width=cfg.cell_width, backtrace=cfg.backtrace)


def check(cfg, pats, txts, pl_, tl_, tag, interpret=True, flag_cap=0.5,
          planes=1):
    assert long_fit_nwswg(cfg), (tag, cfg)
    t0 = time.perf_counter()
    out = nwswg_forward_pallas_long(pats, txts, pl_.astype(np.int32),
                                    tl_.astype(np.int32), cfg=cfg,
                                    interpret=interpret, planes=planes)
    packed = np.asarray(out["packed_runs"])
    dt = time.perf_counter() - t0
    sc = packed[:, 1].astype(np.int32)
    fb = ((packed[:, 0].astype(np.int32) >> 8) & 1).astype(bool)
    osc, oops, ob, oe = oracle(cfg, pats, txts, pl_, tl_)
    bad = 0
    for i in range(len(pl_)):
        if fb[i]:
            continue
        if sc[i] != osc[i]:
            if bad < 3:
                print(f"  [{tag}] pair {i}: score {sc[i]} != {osc[i]} "
                      f"(plen={pl_[i]} tlen={tl_[i]})")
            bad += 1
    if cfg.backtrace and bad == 0:
        wops, wb, we = nat.wfa_runs_to_ops(packed, sc, pl_, tl_,
                                           max_score=1 << 30,
                                           max_ops=2 * cfg.read_size + 8)
        for i in range(len(pl_)):
            if fb[i]:
                continue
            c1 = cigar_of(wops[i], wb[i], we[i])
            c2 = cigar_of(oops[i], ob[i], oe[i])
            if c1 != c2:
                if bad < 3:
                    print(f"  [{tag}] pair {i}: cigar {c1[:60]} != "
                          f"{c2[:60]} score={sc[i]}")
                bad += 1
    fr = fb.mean()
    print(f"[{tag}] n={len(pl_)} flagged={fr:.2f} mismatches={bad} "
          f"t={dt:.1f}s", flush=True)
    assert fr <= flag_cap, (tag, fr)
    return bad


def quick():
    bad = 0
    pairs = random_pairs(seed=31, n=128, max_len=56)
    pats, txts, pl_, tl_ = pack(pairs, 64)
    for algo in ("nw", "swg"):
        cfg = (AlignConfig(algo="nw", read_size=64, max_score=40,
                           backtrace=True, gap_i=2, gap_d=3, mismatch=3)
               if algo == "nw" else
               AlignConfig(algo="swg", read_size=64, max_score=400,
                           backtrace=True, match=0, mismatch=3, gap_o=4,
                           gap_e=1, variant="hbm"))
        bad += check(cfg, pats, txts, pl_, tl_, f"{algo}-small")
    # multi-block: R crosses one block boundary
    for algo, R, l in (("nw", 1120, 1100), ("swg", 560, 550)):
        cfg = (AlignConfig(algo="nw", read_size=R, max_score=300,
                           backtrace=True, gap_i=1, gap_d=1, mismatch=1)
               if algo == "nw" else
               AlignConfig(algo="swg", read_size=R, max_score=400,
                           backtrace=True, match=0, mismatch=3, gap_o=4,
                           gap_e=1, variant="hbm"))
        pats, txts, pl_, tl_ = synth(16, l, 0.01, R, seed=5)
        bad += check(cfg, pats, txts, pl_, tl_, f"{algo}-{l}", flag_cap=0.3)
    print("QUICK", "FAIL" if bad else "OK")
    return bad


def fourk():
    bad = 0
    for algo in ("nw", "swg"):
        R, l = 4096, 4000
        cfg = (AlignConfig(algo="nw", read_size=R, max_score=300,
                           backtrace=True, gap_i=1, gap_d=1, mismatch=1)
               if algo == "nw" else
               AlignConfig(algo="swg", read_size=R, max_score=400,
                           backtrace=True, match=0, mismatch=3, gap_o=4,
                           gap_e=1, variant="hbm"))
        pats, txts, pl_, tl_ = synth(8, l, 0.01, R, seed=9)
        bad += check(cfg, pats, txts, pl_, tl_, f"{algo}-4k", flag_cap=0.3)
    print("4K", "FAIL" if bad else "OK")
    return bad


def tpu(l=4000, planes=1, algos=("nw", "swg"), min_over=None, e=0.01,
        smax=None, mis=None):
    """Real-TPU exactness + marginal for the streamed tier.  planes=2
    measures the wide band; min_over asserts some certified score
    exceeds that bound (proof the data really needs the wide band).
    e tunes the substitution rate: the 16 kbp cap row uses 0.007 so SWG
    scores land in (260, 400] — certified npl=4 work, not max_score
    overflow records.  smax overrides SWG max_score and mis the SWG
    mismatch cost: the npl=8 probe needs certified scores past the
    npl=4 envelope (~516), but the walker's 253-run record capacity
    caps substitution counts near ~126 (synth is substitutions-only:
    each isolated sub costs two runs), so at x=3 certifiable scores top
    out at ~378 — the probe raises the per-sub cost instead (x=5:
    ~113 subs -> score ~565, dmax ~272 > C=255, inside C=511 and the
    run budget)."""
    import jax
    from aim_tpu.api import _ensure_eager_dispatch
    # Sync-mode flip BEFORE any timed region: in a fresh process (no D2H
    # yet) this relay's deferred mode makes block_until_ready return
    # before completion — measured best=0.0ms anchors that corrupt the
    # marginal slope (round-4 sweep, PERFNOTES.md §1).
    _ensure_eager_dispatch()
    # synth() is substitutions-only (lengths == l exactly), so the slack
    # is pure headroom — clamp to the admission cap for the 16 kbp row
    R = min(-(-(l + max(64, l // 8)) // 32) * 32, 16352)
    assert R >= l
    times = {}
    for algo in algos:
        cfg = (AlignConfig(algo="nw", read_size=R, max_score=300,
                           backtrace=True, gap_i=1, gap_d=1, mismatch=1)
               if algo == "nw" else
               AlignConfig(algo="swg", read_size=R, max_score=smax or 400,
                           backtrace=True, match=0, mismatch=mis or 3,
                           gap_o=4, gap_e=1, variant="hbm"))
        for n in (128, 256):
            pats, txts, pl_, tl_ = synth(n, l, e, R, seed=3)
            dp = jax.device_put(pats)
            dt_ = jax.device_put(txts)
            dpl = jax.device_put(pl_.astype(np.int32))
            dtl = jax.device_put(tl_.astype(np.int32))
            jax.block_until_ready((dp, dt_, dpl, dtl))
            t0 = time.perf_counter()
            out = nwswg_forward_pallas_long(dp, dt_, dpl, dtl, cfg=cfg,
                                            planes=planes)
            jax.block_until_ready(out)
            tc = time.perf_counter() - t0
            best = T.best_of(
                lambda: nwswg_forward_pallas_long(dp, dt_, dpl, dtl,
                                                  cfg=cfg, planes=planes),
                repeats=3, warmup=False)
            packed = np.asarray(out["packed_runs"])
            sc = packed[:, 1].astype(np.int32)
            fb = ((packed[:, 0].astype(np.int32) >> 8) & 1).astype(bool)
            if n == 128:
                osc, oops, ob, oe = oracle(cfg, pats, txts, pl_, tl_)
                ok = ~fb
                assert (sc[ok] == osc[ok]).all(), \
                    (algo, np.where(sc[ok] != osc[ok]))
                wops, wb, we = nat.wfa_runs_to_ops(
                    packed, sc, pl_, tl_, max_score=1 << 30,
                    max_ops=2 * R + 8)
                nc = sum(cigar_of(wops[i], wb[i], we[i])
                         != cigar_of(oops[i], ob[i], oe[i])
                         for i in range(n) if ok[i])
                print(f"{algo}{f'-npl{planes}' if planes > 1 else ''} l={l} "
                      f"n={n}: compile={tc:.1f}s best={best*1e3:.1f}ms "
                      f"flagged={fb.mean():.2f} cigar_bad={nc}",
                      flush=True)
                assert nc == 0
                if min_over is not None:
                    assert (sc[ok] > min_over).any()
            else:
                print(f"{algo} l={l} n={n}: best={best*1e3:.1f}ms "
                      f"({best/n*1e6:.1f} us/pair raw)", flush=True)
            times[(algo, n)] = best
    for algo in algos:
        marg = (times[(algo, 256)] - times[(algo, 128)]) / 128 * 1e6
        print(f"{algo}{f'-npl{planes}' if planes > 1 else ''} l={l}: "
              f"marginal {marg:.1f} us/pair", flush=True)


FUZZ_COST_MODELS = [
    # (algo, costs, long_flag_cap): the cap at the 576-length geometry.
    # match>0 inflates scores linearly with length, so the band
    # certification bound dmax=(smax-2go)/(2ge) flags everything at
    # ~500 bp with smax=400 — equality on unflagged pairs still holds
    # and the short-geometry runs exercise the model's tie-breaks.
    # NW: cheap-gap alias chains / gap-vs-X ties / asymmetric gaps
    ("nw", dict(max_score=40, gap_i=2, gap_d=5, mismatch=1), 0.6),
    ("nw", dict(max_score=40, gap_i=1, gap_d=1, mismatch=4), 0.6),
    ("nw", dict(max_score=40, gap_i=3, gap_d=2, mismatch=2), 0.6),
    # SWG: ge>go / match=0 / heavy mismatch / deep-extension regimes
    ("swg", dict(max_score=400, match=0, mismatch=5, gap_o=6, gap_e=2,
                 variant="hbm"), 0.6),
    ("swg", dict(max_score=400, match=0, mismatch=7, gap_o=2, gap_e=3,
                 variant="hbm"), 0.6),
    ("swg", dict(max_score=400, match=2, mismatch=3, gap_o=1, gap_e=1,
                 variant="hbm"), 1.0),
]


def fuzz_planes4(seed0=401):
    """Interpret-mode equality for the npl=4 ladder stage (C=255):
    multi-block geometry with length skews past the wide band's C=127
    — only certifiable at 4 planes.  One cost model per algorithm to
    bound the interpret-mode runtime."""
    bad = 0
    for algo, kw, cap in (FUZZ_COST_MODELS[1], FUZZ_COST_MODELS[3]):
        rng = __import__("random").Random(seed0)
        pairs = []
        for i in range(8):
            lp = rng.randrange(180, 280)
            # odd pairs: skew past the wide band's C=127 but inside the
            # npl=4 certification envelope (skew + dmax + 1 <= 255 with
            # dmax ~ skew/2 under these cheap-gap models => skew <~ 160)
            skew = rng.randrange(130, 158) if i % 2 else \
                rng.choice([-1, 0, 1])
            pairs.append(make_pair(rng, lp, max(1, lp + skew),
                                   rng.randrange(0, 6)))
        pats, txts, pl_, tl_ = pack(pairs, 576)
        cfg = AlignConfig(algo=algo, read_size=576, backtrace=True, **kw)
        bad += check(cfg, pats, txts, pl_, tl_,
                     f"{algo}-576-npl4 {kw}", flag_cap=0.5, planes=4)
    print("FUZZ4", "FAIL" if bad else "OK")
    return bad


def fuzz_planes8(seed0=801):
    """Interpret-mode equality for the npl=8 ladder stage (C=511):
    multi-block geometry with length skews past the npl=4 band's C=255
    — only certifiable at 8 planes.  One cost model per algorithm
    (interpret-mode cost at 8 planes is ~2x the npl=4 run)."""
    bad = 0
    for algo, kw, cap in (FUZZ_COST_MODELS[1], FUZZ_COST_MODELS[3]):
        rng = __import__("random").Random(seed0)
        pairs = []
        for i in range(8):
            lp = rng.randrange(180, 280)
            # odd pairs: skew past the npl=4 band's C=255 but inside
            # the npl=8 certification envelope (skew + dmax + 1 <= 511
            # with dmax ~ skew/2 under these cheap-gap models
            # => skew <~ 330)
            skew = rng.randrange(262, 320) if i % 2 else \
                rng.choice([-1, 0, 1])
            pairs.append(make_pair(rng, lp, max(1, lp + skew),
                                   rng.randrange(0, 6)))
        pats, txts, pl_, tl_ = pack(pairs, 640)
        cfg = AlignConfig(algo=algo, read_size=640, backtrace=True, **kw)
        bad += check(cfg, pats, txts, pl_, tl_,
                     f"{algo}-640-npl8 {kw}", flag_cap=0.5, planes=8)
    print("FUZZ8", "FAIL" if bad else "OK")
    return bad


def fuzz(seed0=201, n_seeds=2):
    """Interpret-mode cost-model sweep (single-block R=64 and
    multi-block R=576) — the CPU-runnable slice of
    tools/fuzz_kernels.py's long-kernel configs."""
    bad = 0
    for algo, kw, long_cap in FUZZ_COST_MODELS:
        for s in range(seed0, seed0 + n_seeds):
            pairs = random_pairs(seed=s, n=128, max_len=56)
            pats, txts, pl_, tl_ = pack(pairs, 64)
            cfg = AlignConfig(algo=algo, read_size=64, backtrace=True, **kw)
            bad += check(cfg, pats, txts, pl_, tl_,
                         f"{algo}-64 {kw} s={s}", flag_cap=0.6)
        # multi-block geometry, one seed per model
        rng = __import__("random").Random(seed0 + 7)
        pairs = []
        for _ in range(8):
            lp = rng.randrange(430, 560)
            pairs.append(make_pair(rng, lp,
                                   max(1, lp + rng.choice([-1, 0, 1])),
                                   rng.randrange(0, 8)))
        pats, txts, pl_, tl_ = pack(pairs, 576)
        cfg = AlignConfig(algo=algo, read_size=576, backtrace=True, **kw)
        bad += check(cfg, pats, txts, pl_, tl_,
                     f"{algo}-576 {kw}", flag_cap=long_cap)
        # same data through the WIDE band (npl=2, C=127): equality must
        # hold there too (flag RATES may differ either way — e.g. the
        # bad_alias bound hs = C + dmax + 3 grows with C — both bands'
        # flags are conservative and flagged pairs fall back)
        bad += check(cfg, pats, txts, pl_, tl_,
                     f"{algo}-576w {kw}", flag_cap=long_cap, planes=2)
    print("FUZZ", "FAIL" if bad else "OK")
    return bad


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "quick"
    if mode == "quick":
        sys.exit(1 if quick() else 0)
    elif mode == "4k":
        sys.exit(1 if fourk() else 0)
    elif mode == "fuzz":
        sys.exit(1 if fuzz(
            int(sys.argv[2]) if len(sys.argv) > 2 else 201,
            int(sys.argv[3]) if len(sys.argv) > 3 else 2) else 0)
    elif mode == "tpu":
        tpu(int(sys.argv[2]) if len(sys.argv) > 2 else 4000)
    elif mode == "tpu-wide":
        # SWG e=1% at l=6000: score ~ 180, past the C=63 envelope (132)
        # but inside the wide one (260) — compile + exactness + marginal.
        # Optional 3rd arg = plane count (4 doubles the envelope again:
        # SWG e=1% to ~18 kbp; needs a real-TPU compile check first).
        _pl = int(sys.argv[3]) if len(sys.argv) > 3 else 2
        # prove the data really needed THIS band: certified scores must
        # exceed the previous stage's envelope (~2*C_prev + max_score
        # terms; 132 is the measured C=63 SWG bound, 260 the C=127 one,
        # 516 the C=255 one).  npl=8 probes need max_score past 516 —
        # raise it to 1200 so in-envelope scores aren't overflow records.
        _over = {2: 132, 4: 260, 8: 516}.get(_pl, 260)
        tpu(int(sys.argv[2]) if len(sys.argv) > 2 else 6000,
            planes=_pl, algos=("swg",), min_over=_over,
            e=float(sys.argv[4]) if len(sys.argv) > 4 else 0.01,
            smax=1200 if _pl >= 8 else None,
            mis=5 if _pl >= 8 else None)
    elif mode == "fuzz4":
        # interpret-mode equality at npl=4 (C=255), multi-block geometry
        sys.exit(1 if fuzz_planes4() else 0)
    elif mode == "fuzz8":
        # interpret-mode equality at npl=8 (C=511), skews past C=255
        sys.exit(1 if fuzz_planes8() else 0)
