import numpy as np
import jax

from dashing_tpu import u64
from dashing_tpu.hashes import wang_hash, wang_hash_np


def _rand_u64(rng, n):
    return rng.integers(0, 2**64, size=n, dtype=np.uint64)


def test_roundtrip(rng):
    x = _rand_u64(rng, 1000)
    assert (u64.to_np(u64.from_np(x)) == x).all()


def test_add(rng):
    a, b = _rand_u64(rng, 1000), _rand_u64(rng, 1000)
    with np.errstate(over="ignore"):
        want = a + b
    got = u64.to_np(u64.add(u64.from_np(a), u64.from_np(b)))
    assert (got == want).all()


def test_shifts(rng):
    a = _rand_u64(rng, 257)
    da = u64.from_np(a)
    for n in [0, 1, 5, 21, 31, 32, 33, 47, 63]:
        assert (u64.to_np(u64.shl(da, n)) == (a << np.uint64(n))).all(), n
        assert (u64.to_np(u64.shr(da, n)) == (a >> np.uint64(n))).all(), n


def test_rotl(rng):
    a = _rand_u64(rng, 100)
    da = u64.from_np(a)
    for n in [1, 17, 32, 50]:
        want = (a << np.uint64(n)) | (a >> np.uint64(64 - n))
        assert (u64.to_np(u64.rotl(da, n)) == want).all()


def test_mul_const(rng):
    a = _rand_u64(rng, 500)
    for c in [3, 0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 265, 21]:
        with np.errstate(over="ignore"):
            want = a * np.uint64(c)
        got = u64.to_np(u64.mul_const(u64.from_np(a), c))
        assert (got == want).all(), hex(c)


def test_mul(rng):
    a, b = _rand_u64(rng, 500), _rand_u64(rng, 500)
    with np.errstate(over="ignore"):
        want = a * b
    got = u64.to_np(u64.mul(u64.from_np(a), u64.from_np(b)))
    assert (got == want).all()


def test_cmp_minmax(rng):
    a, b = _rand_u64(rng, 1000), _rand_u64(rng, 1000)
    da, db = u64.from_np(a), u64.from_np(b)
    assert (np.asarray(u64.lt(da, db)) == (a < b)).all()
    assert (np.asarray(u64.le(da, db)) == (a <= b)).all()
    assert (u64.to_np(u64.min_(da, db)) == np.minimum(a, b)).all()


def test_clz(rng):
    vals = np.array([0, 1, 2, 3, 2**31, 2**32 - 1, 2**32, 2**33,
                     2**63, 2**64 - 1] + list(_rand_u64(rng, 100)),
                    dtype=np.uint64)
    want = np.array([64 if v == 0 else 64 - int(v).bit_length() for v in vals])
    got = np.asarray(u64.clz(u64.from_np(vals)))
    assert (got == want).all()


def test_wang_hash_matches_numpy(rng):
    x = _rand_u64(rng, 4096)
    want = wang_hash_np(x)
    got = u64.to_np(jax.jit(wang_hash)(u64.from_np(x)))
    assert (got == want).all()


def test_wang_hash_known_values():
    """Hardcoded anchors computed from Wang's published shift/add/xor
    sequence with arbitrary-precision Python ints — INDEPENDENT of both
    wang_hash (device) and wang_hash_np, so a wrong constant in either
    cannot self-certify."""
    anchors = {
        0x0000000000000000: 0x77CFA1EEF01BCA90,
        0x0000000000000001: 0x5BCA7C69B794F8CE,
        0x00000000DEADBEEF: 0x386F2A5F36B257CB,
        0x123456789ABCDEF0: 0xE8E8981FD9F20F7F,
        0xFFFFFFFFFFFFFFFF: 0x1F89206E3F8EC794,
    }
    x = np.array(list(anchors.keys()), np.uint64)
    want = np.array(list(anchors.values()), np.uint64)
    got_dev = u64.to_np(wang_hash(u64.from_np(x)))
    np.testing.assert_array_equal(got_dev, want)
    np.testing.assert_array_equal(wang_hash_np(x), want)
    # The mixer must be "random": distinct outputs on consecutive inputs.
    many = u64.to_np(wang_hash(u64.from_np(np.arange(16, dtype=np.uint64))))
    assert len(set(many.tolist())) == 16


def test_gf64_mul_device_matches_numpy(rng):
    from dashing_tpu import hashes, u64
    a = rng.integers(0, 2**64, 256, dtype=np.uint64)
    b = rng.integers(0, 2**64, 256, dtype=np.uint64)
    want = hashes.gf64_mul_np(a, b)
    got = u64.to_np(hashes.gf64_mul(u64.from_np(a), u64.from_np(b)))
    np.testing.assert_array_equal(got, want)


def test_gf64_field_laws(rng):
    """GF(2^64): multiplication by 1 is identity, commutative,
    distributive over XOR."""
    from dashing_tpu import hashes
    a = rng.integers(0, 2**64, 64, dtype=np.uint64)
    b = rng.integers(0, 2**64, 64, dtype=np.uint64)
    c = rng.integers(0, 2**64, 64, dtype=np.uint64)
    one = np.uint64(1)
    np.testing.assert_array_equal(hashes.gf64_mul_np(a, one), a)
    np.testing.assert_array_equal(hashes.gf64_mul_np(a, b),
                                  hashes.gf64_mul_np(b, a))
    np.testing.assert_array_equal(
        hashes.gf64_mul_np(a ^ b, c),
        hashes.gf64_mul_np(a, c) ^ hashes.gf64_mul_np(b, c))


def test_clhash_device_matches_numpy_and_disperses(rng):
    from dashing_tpu import hashes, u64
    x = np.arange(1 << 13, dtype=np.uint64)   # adversarially sequential
    want = hashes.clhash_np(x, seed=11)
    got = u64.to_np(hashes.clhash(u64.from_np(x), seed=11))
    np.testing.assert_array_equal(got, want)
    assert np.unique(want).size == x.size     # injective on this input
    # top-8-bit buckets near-uniform (GF multiply by a dense constant
    # spreads sequential keys)
    counts = np.bincount((want >> np.uint64(56)).astype(np.int64),
                         minlength=256)
    assert counts.max() < 3 * (x.size / 256)
