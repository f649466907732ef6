"""HeavyKeeper prefilter (sketch/heavykeeper.py, native/hk.cpp).

The reference reaches hk::HeavyKeeper only via the compile-time
-DDASHING_USE_HK CountingSketch switch (src/dashing.h:131-136); ours is
the runtime analog behind DASHING_TPU_USE_HK=1.
"""
import numpy as np
import pytest

from dashing_tpu.sketch.heavykeeper import HeavyKeeper


def _skewed_stream(rng, heavy_count=500, n_light=2000):
    heavy = np.uint64(42)
    stream = np.concatenate([
        np.full(heavy_count, heavy, np.uint64),
        rng.integers(0, 2**63, n_light, dtype=np.uint64)])
    rng.shuffle(stream)
    return heavy, stream


def test_hk_heavy_hitter_counts(rng):
    heavy, stream = _skewed_stream(rng)
    hk = HeavyKeeper(4, 16, seed=7)
    hk.add_np(stream)
    # a heavy key is nearly impossible to evict: count ~ exact
    assert hk.query_np(np.asarray([heavy]))[0] >= 450
    # mice stay mice (underestimation is the design)
    light = hk.query_np(stream[stream != heavy][:500])
    assert light.max() <= 3
    # an unseen key queries 0 (no false fingerprint at this load)
    assert hk.query_np(np.asarray([np.uint64(2**63 + 12345)], np.uint64))[0] \
        <= 1


def test_hk_python_fallback_matches_native(rng):
    hk_native = HeavyKeeper(3, 12, seed=99)
    if not hk_native.native:
        pytest.skip("native library unavailable")
    hk_py = HeavyKeeper(3, 12, seed=99, force_python=True)
    _, stream = _skewed_stream(rng, heavy_count=50, n_light=300)
    hk_native.add_np(stream)
    hk_py.add_np(stream)
    q = rng.permutation(stream)[:200]
    np.testing.assert_array_equal(hk_native.query_np(q), hk_py.query_np(q))


def test_hk_prefilter_matches_countmin_on_clean_data(tmp_path, rng,
                                                     monkeypatch):
    """-y -c 2 admits the same k-mer set through HK as through count-min
    when the table is far from saturated (both are then exact), so the
    sketch output must be identical."""
    from dashing_tpu.cli import core
    seq = "".join(rng.choice(list("ACGT"), size=3000))
    uniq = "".join(rng.choice(list("ACGT"), size=1000))
    fa = tmp_path / "hk.fa"
    # duplicated record -> those k-mers have multiplicity 2
    fa.write_text(f">a\n{seq}\n>b\n{seq}\n>c\n{uniq}\n")
    o = core.CommonOpts()
    o.k, o.sketch_size = 21, 12
    o.use_counting_filter, o.mincount = True, 2
    want = core.sketch_or_load(str(fa), o)
    monkeypatch.setenv("DASHING_TPU_USE_HK", "1")
    got = core.sketch_or_load(str(fa), o)
    np.testing.assert_array_equal(got.regs, want.regs)
    # and the filter actually filtered: unfiltered sketch differs
    o2 = core.CommonOpts()
    o2.k, o2.sketch_size = 21, 12
    unfiltered = core.sketch_or_load(str(fa), o2)
    assert not np.array_equal(got.regs, unfiltered.regs)
