"""AIM_TPU_SORT=1 runs device work in estimated-difficulty order and
restores output order (SURVEY §7.3's termination-divergence mitigation:
similar-difficulty pairs share a kernel tile, each tile's while-loop
exits at its own hardest pair).  Results must be bit-identical to the
unsorted path — including flagged pairs that take the retry/host
fallback — and the flag must be a no-op under sharding."""

import numpy as np
import pytest

from aim_tpu import api
from aim_tpu.config import derive_config
from tests.util import make_pair, pack

import random


def _mixed_difficulty_pairs(seed, n, max_len):
    """Wide spread of error counts so the difficulty sort actually
    permutes (uniform-error batches barely move)."""
    rng = random.Random(seed)
    pairs = []
    for i in range(n):
        plen = rng.randrange(10, max_len - 4)
        tlen = max(1, min(max_len, plen + rng.choice([-2, -1, 0, 0, 1, 2])))
        nerr = rng.choice([0, 0, 1, 2, 5, 9, 14])
        pairs.append(make_pair(rng, plen, tlen, nerr))
    return pairs


def _aligned(cfg, arrays, monkeypatch, sort):
    monkeypatch.setenv("AIM_TPU_SORT", "1" if sort else "0")
    return api.align(*arrays, cfg)


@pytest.mark.parametrize("algo", ["nw", "swg", "wfa", "genasm"])
def test_sorted_identical(algo, monkeypatch):
    cfg = derive_config(algo, 40, 0.05, backtrace=True,
                        adaptive=(algo == "wfa"), batch_pairs=64)
    pairs = _mixed_difficulty_pairs(seed=41, n=300, max_len=40)
    arrays = pack(pairs, cfg.read_size)
    order = api._difficulty_order(*arrays)
    assert not np.array_equal(order, np.arange(len(order)))  # really sorts
    base = _aligned(cfg, arrays, monkeypatch, sort=False)
    sort = _aligned(cfg, arrays, monkeypatch, sort=True)
    np.testing.assert_array_equal(base.scores, sort.scores)
    np.testing.assert_array_equal(base.ops, sort.ops)
    np.testing.assert_array_equal(base.begin, sort.begin)
    np.testing.assert_array_equal(base.end, sort.end)
    assert base.n_fallback == sort.n_fallback


def test_sort_noop_under_sharding(monkeypatch):
    jax = pytest.importorskip("jax")
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    devs = np.array(jax.devices()[:8])
    if len(devs) < 2:
        pytest.skip("needs a multi-device mesh")
    mesh = Mesh(devs, ("pairs",))
    sharding = NamedSharding(mesh, P("pairs"))
    monkeypatch.setenv("AIM_TPU_SORT", "1")
    cfg = derive_config("nw", 24, 0.05, backtrace=True, batch_pairs=64)
    pairs = _mixed_difficulty_pairs(seed=43, n=256, max_len=24)
    pats, txts, pl, tl = pack(pairs, cfg.read_size)
    res = api.align(pats, txts, pl, tl, cfg, device_sharding=sharding)
    from aim_tpu import native
    want, *_ = native.nw_align(pats, txts, pl, tl, mismatch=cfg.mismatch,
                               gap_i=cfg.gap_i, gap_d=cfg.gap_d,
                               backtrace=False)
    np.testing.assert_array_equal(res.scores, want)


def test_difficulty_order_subsampling():
    # long reads subsample columns; the proxy must still rank a clean
    # pair below a mutated one
    R = 8192
    n = 130
    rng = np.random.default_rng(7)
    base = rng.integers(65, 69, (1, R), dtype=np.uint8)
    pats = np.repeat(base, n, axis=0)
    txts = pats.copy()
    txts[0, ::17] = 90  # pair 0: heavily mutated
    pl = np.full(n, R, np.int32)
    tl = np.full(n, R, np.int32)
    order = api._difficulty_order(pats, txts, pl, tl)
    assert order[-1] == 0  # hardest pair sorts last
