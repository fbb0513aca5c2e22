"""AIM_TPU_FUSED_UPLOAD=1 routes each chunk's four inputs through one
uint8 H2D buffer + an on-device split (api._make_unfuse).  Results must
be bit-identical to the per-array path on every algorithm/backend combo
the wave loop serves; the flag must also be ignored under sharding."""

import numpy as np
import pytest

from aim_tpu import api
from aim_tpu.config import derive_config
from tests.util import random_pairs, pack


def _aligned(cfg, pairs, monkeypatch, fused):
    monkeypatch.setenv("AIM_TPU_FUSED_UPLOAD", "1" if fused else "0")
    pats, txts, pl, tl = pack(pairs, cfg.read_size)
    return api.align(pats, txts, pl, tl, cfg)


@pytest.mark.parametrize("algo", ["nw", "swg", "wfa"])
def test_fused_upload_identical(algo, monkeypatch):
    cfg = derive_config(algo, 40, 0.05, backtrace=True,
                        adaptive=(algo == "wfa"), batch_pairs=64)
    pairs = random_pairs(seed=91, n=150, max_len=40)  # >2 chunks
    base = _aligned(cfg, pairs, monkeypatch, fused=False)
    fusd = _aligned(cfg, pairs, monkeypatch, fused=True)
    np.testing.assert_array_equal(base.scores, fusd.scores)
    np.testing.assert_array_equal(base.ops, fusd.ops)
    np.testing.assert_array_equal(base.begin, fusd.begin)
    np.testing.assert_array_equal(base.end, fusd.end)


def test_unfuse_roundtrip_exact():
    # The device-side splitter inverts _fuse_chunk exactly, including
    # int32 length bitcasts and non-multiple-of-4 column counts.
    bs, p_cols, t_cols = 16, 11, 13
    rng = np.random.default_rng(5)
    cp = rng.integers(0, 256, (bs, p_cols), dtype=np.uint8)
    ct = rng.integers(0, 256, (bs, t_cols), dtype=np.uint8)
    cpl = rng.integers(0, 2 ** 20, bs).astype(np.int32)
    ctl = rng.integers(0, 2 ** 20, bs).astype(np.int32)
    out = api._make_unfuse(bs, p_cols, t_cols)(
        api._fuse_chunk(cp, ct, cpl, ctl))
    for got, want in zip(out, (cp, ct, cpl, ctl)):
        np.testing.assert_array_equal(np.asarray(got), want)


def test_fused_upload_ignored_under_sharding(monkeypatch):
    # A sharded run must not take the fused path (flat byte buffers have
    # no pairs sharding); results stay correct with the flag set.
    jax = pytest.importorskip("jax")
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    devs = np.array(jax.devices()[:8])
    if len(devs) < 2:
        pytest.skip("needs a multi-device mesh")
    mesh = Mesh(devs, ("pairs",))
    sharding = NamedSharding(mesh, P("pairs"))
    monkeypatch.setenv("AIM_TPU_FUSED_UPLOAD", "1")
    cfg = derive_config("nw", 24, 0.05, backtrace=True, batch_pairs=64)
    pairs = random_pairs(seed=17, n=64, max_len=24)
    pats, txts, pl, tl = pack(pairs, cfg.read_size)
    res = api.align(pats, txts, pl, tl, cfg, device_sharding=sharding)
    from aim_tpu import native
    want, *_ = native.nw_align(pats, txts, pl, tl, mismatch=cfg.mismatch,
                               gap_i=cfg.gap_i, gap_d=cfg.gap_d,
                               backtrace=False)
    np.testing.assert_array_equal(res.scores, want)
