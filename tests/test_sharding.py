"""Multi-device pair sharding on the virtual 8-device CPU mesh."""

import jax
import numpy as np

import aim_tpu.native as nat
from aim_tpu.config import AlignConfig
from aim_tpu.parallel import make_mesh, pair_sharding
from tests.util import cigar_of, pack, random_pairs


def test_eight_device_mesh_available():
    assert len(jax.devices()) == 8


def test_sharded_wfa_matches_oracle():
    R = 24
    pairs = random_pairs(seed=31, n=64, max_len=R)
    pats, txts, pl, tl = pack(pairs, R)
    cfg = AlignConfig(algo="wfa", read_size=R, max_score=12, backtrace=True,
                      backend="xla", adaptive=True, batch_pairs=64)
    from aim_tpu.api import align
    sharding = pair_sharding(make_mesh())
    res = align(pats, txts, pl, tl, cfg, device_sharding=sharding)
    osc, oops, ob, oe = nat.wfa_align(pats, txts, pl, tl, mismatch=3,
                                      gap_o=4, gap_e=1, max_score=12,
                                      adaptive=True, backtrace=True)
    np.testing.assert_array_equal(res.scores, osc)
    for i in range(len(pairs)):
        assert cigar_of(res.ops[i], res.begin[i], res.end[i]) == \
            cigar_of(oops[i], ob[i], oe[i])


def test_shard_range_covers_and_preserves_order():
    from aim_tpu.parallel.mesh import shard_range
    total = 1003
    covered = []
    for h in range(4):
        lo, hi = shard_range(total, h, 4)
        covered.extend(range(lo, hi))
    assert covered == list(range(total))
