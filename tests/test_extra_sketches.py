import numpy as np
import pytest

from dashing_tpu.sketch.extra import WideHLL, HyperMinHash, DensifiedMinHash
from dashing_tpu.sketch.setsketches import (BloomFilter, BottomK,
                                            CountingBottomK, BBitMinHash,
                                            CountingBBitMinHash)
from dashing_tpu.cli import main as climain


def _overlapping_sets(rng, n=20000, frac=0.5):
    shared = rng.integers(0, 2**62, int(n * frac), dtype=np.uint64)
    a = np.concatenate([shared, rng.integers(2**62, 2**63, n - shared.size,
                                             dtype=np.uint64)])
    b = np.concatenate([shared, rng.integers(2**63, 2**64 - 1,
                                             n - shared.size,
                                             dtype=np.uint64)])
    true_ji = shared.size / (a.size + b.size - shared.size)
    return a, b, true_ji


@pytest.mark.parametrize("cls,kwargs,tol", [
    (BloomFilter, dict(nbits_log2=18, nhashes=2), 0.08),
    (BottomK, dict(kk=2048), 0.08),
    (BBitMinHash, dict(p=12, b=16), 0.08),
    (CountingBBitMinHash, dict(p=12, b=16), 0.08),
    (WideHLL, dict(p=12), 0.08),
    (HyperMinHash, dict(p=12, regwidth=16), 0.10),
    (DensifiedMinHash, dict(p=12, b=16), 0.08),
])
def test_jaccard_accuracy(rng, cls, kwargs, tol):
    a_vals, b_vals, true_ji = _overlapping_sets(rng)
    sa, sb = cls(**kwargs), cls(**kwargs)
    sa.addh_np(a_vals)
    sb.addh_np(b_vals)
    sa.finalize()
    sb.finalize()
    ji = sa.jaccard_index(sb)
    assert abs(ji - true_ji) < tol, (cls.__name__, ji, true_ji)


@pytest.mark.parametrize("cls,kwargs,tol", [
    (BloomFilter, dict(nbits_log2=18, nhashes=2), 0.05),
    (BottomK, dict(kk=2048), 0.08),
    (BBitMinHash, dict(p=12, b=16), 0.10),
    (CountingBBitMinHash, dict(p=12, b=16), 0.10),
    (WideHLL, dict(p=12), 0.05),
    (HyperMinHash, dict(p=12, regwidth=16), 0.05),
    (DensifiedMinHash, dict(p=12, b=16), 0.10),
])
def test_cardinality_accuracy(rng, cls, kwargs, tol):
    n = 30000
    vals = rng.integers(0, 2**63, n, dtype=np.uint64)
    sk = cls(**kwargs)
    sk.addh_np(vals)
    sk.finalize()
    assert abs(sk.report() - n) / n < tol, (cls.__name__, sk.report())


@pytest.mark.parametrize("cls,kwargs", [
    (BloomFilter, dict(nbits_log2=14, nhashes=2)),
    (BottomK, dict(kk=256)),
    (CountingBottomK, dict(kk=256)),
    (BBitMinHash, dict(p=8, b=16)),
    (CountingBBitMinHash, dict(p=8, b=16)),
    (WideHLL, dict(p=8)),
    (HyperMinHash, dict(p=8, regwidth=16)),
    (DensifiedMinHash, dict(p=8, b=16)),
])
def test_merge_and_serialization(rng, cls, kwargs, tmp_path):
    a_vals = rng.integers(0, 2**62, 3000, dtype=np.uint64)
    b_vals = rng.integers(2**61, 2**63, 3000, dtype=np.uint64)
    sa, sb, sab = cls(**kwargs), cls(**kwargs), cls(**kwargs)
    sa.addh_np(a_vals)
    sb.addh_np(b_vals)
    sab.addh_np(np.concatenate([a_vals, b_vals]))
    sa += sb
    sa.finalize()
    sab.finalize()
    # merged sketch equals direct sketch of the union (all these structures
    # merge losslessly)
    assert abs(sa.report() - sab.report()) / max(sab.report(), 1) < 0.05
    path = str(tmp_path / "s.bin")
    sa.write(path)
    back = cls.read(path)
    sa.finalize()
    back.finalize()
    assert abs(back.report() - sa.report()) < 1e-6
    # the UNDERLYING state must round-trip too (a reader that permutes
    # registers or drops counts can keep report() intact)
    for attr in ("regs", "values", "counts", "bits", "mins"):
        if hasattr(sa, attr):
            np.testing.assert_array_equal(getattr(back, attr),
                                          getattr(sa, attr), err_msg=attr)
    # and pairwise self-similarity must survive deserialization
    assert sa.jaccard_index(back) > 0.95


def test_counting_bottomk_histogram_intersection(rng):
    base = rng.integers(0, 2**62, 2000, dtype=np.uint64)
    a = np.repeat(base, 2)          # every element twice
    b = base                        # every element once
    sa, sb = CountingBottomK(512), CountingBottomK(512)
    sa.addh_np(a)
    sb.addh_np(b)
    hi = sa.histogram_intersection(sb)
    assert abs(hi - 0.5) < 0.05, hi


@pytest.mark.parametrize("flag", ["--use-wide-hll", "--use-superminhash",
                                  "--use-hyperminhash", "--use-bloom-filter",
                                  "--use-range-minhash", "--use-bb-minhash",
                                  "--use-counting-bb-minhash"])
def test_cli_type_dispatch(tmp_path, rng, capsys, flag):
    seq = "".join(rng.choice(list("ACGT"), size=3000))
    seq2 = seq[:1500] + "".join(rng.choice(list("ACGT"), size=1500))
    a = tmp_path / "a.fa"
    b = tmp_path / "b.fa"
    a.write_text(f">a\n{seq}\n")
    b.write_text(f">b\n{seq2}\n")
    rc = climain.main(["dist", "-k", "21", "-S", "12", flag,
                       "--avoid-sorting", str(a), str(b)])
    assert rc == 0
    out = capsys.readouterr().out
    ji = float(out.splitlines()[-2].split("\t")[-1])
    assert 0.2 < ji < 0.65, (flag, ji)


def test_crmh_weighted_jaccard_reflects_multiplicity():
    """similarity<CRMFinal> = histogram intersection (reference
    src/dashing.h:142-144): same SET with different multiplicities must NOT
    give JI 1.0, and the comparison triple must agree with it."""
    from dashing_tpu.sketch.setsketches import CountingBottomK
    a, b = CountingBottomK(64), CountingBottomK(64)
    vals = np.arange(1, 40, dtype=np.uint64)
    a.addh_np(np.repeat(vals, 3))
    b.addh_np(vals)
    ji = a.jaccard_index(b)
    assert abs(ji - 1.0 / 3.0) < 1e-9
    tri = a.full_set_comparison(b)
    assert abs(tri[2] / sum(tri) - ji) < 1e-9


def test_crmh_union_preserves_counts():
    """CountingBottomK merge must combine counts, not just values (the
    inherited BottomK merge silently desynced values from counts)."""
    from dashing_tpu.sketch.setsketches import CountingBottomK
    a, b = CountingBottomK(64), CountingBottomK(64)
    vals = np.arange(1, 30, dtype=np.uint64)
    a.addh_np(np.repeat(vals, 2))
    b.addh_np(vals)
    a += b
    assert a.values.size == a.counts.size
    # every merged element should carry count 3 (2 from a + 1 from b)
    want = CountingBottomK(64)
    want.addh_np(np.repeat(vals, 3))
    np.testing.assert_array_equal(a.values, want.values)
    np.testing.assert_array_equal(a.counts, want.counts)
    # and the record round-trips coherently
    import io as _io
    buf = _io.BytesIO()
    a.write_record(buf)
    buf.seek(0)
    back = CountingBottomK.read_record(buf)
    np.testing.assert_array_equal(back.counts, a.counts)


def test_bbmh_disjoint_sparse_sets_not_inflated(rng):
    """Mutually-empty buckets must not count as register matches: two tiny
    DISJOINT sets must give JI ~0, not ~1."""
    from dashing_tpu.sketch.setsketches import BBitMinHash
    a, b = BBitMinHash(9, 16), BBitMinHash(9, 16)
    a.addh_np(rng.integers(0, 2 ** 63, 10, dtype=np.uint64))
    b.addh_np(rng.integers(0, 2 ** 63, 10, dtype=np.uint64))
    assert a.jaccard_index(b) < 0.2
    # identical sets still give 1
    c = BBitMinHash(9, 16)
    c.mins = a.mins.copy()
    assert a.jaccard_index(c) > 0.95


def test_hmh_regwidth_64_clamped(rng):
    from dashing_tpu.sketch.extra import HyperMinHash
    h = HyperMinHash(10, regwidth=64)
    assert h.regwidth == 32
    vals = rng.integers(0, 2 ** 63, 5000, dtype=np.uint64)
    h.addh_np(vals)
    card = h.getcard()
    assert 0.8 * 5000 < card < 1.25 * 5000


@pytest.mark.parametrize("which", ["whll", "cbmh"])
def test_truncated_sketch_files_rejected(tmp_path, rng, which):
    import gzip
    from dashing_tpu.sketch.extra import WideHLL
    cls = WideHLL if which == "whll" else CountingBBitMinHash
    w = cls(8)
    w.addh_np(rng.integers(0, 2 ** 63, 100, dtype=np.uint64))
    path = str(tmp_path / f"w.{which}")
    w.write(path)
    blob = gzip.open(path, "rb").read()
    with gzip.open(path, "wb") as fp:
        fp.write(blob[:len(blob) // 2])
    with pytest.raises(EOFError, match="truncated"):
        cls.read(path)


def test_jukes_cantor_corrected_counts():
    """jukes_cantor_p must use size - (k-1)*numseqs per k (reference
    background.cpp:85): fragmented assemblies overstate k-mer counts."""
    from dashing_tpu import background as bg
    ks = [15, 17, 19]
    # synthetic: sizes chosen so the correction changes the background term
    isz = [1e5, 6e4, 4e4]
    p_whole = bg.jukes_cantor_p(ks, isz, 0.25, 1e6, 1e6, 1, 1)
    p_frag = bg.jukes_cantor_p(ks, isz, 0.25, 1e6, 1e6, 10000, 10000)
    assert p_whole == p_whole and p_frag == p_frag
    assert p_whole != p_frag   # the numseqs correction must matter


# --------------------------- real SuperMinHash ------------------------------

def test_superminhash_order_and_chunk_invariance(rng):
    """The lockstep early stop only skips provably-no-op updates, so the
    registers must be EXACTLY independent of insertion order / chunking."""
    from dashing_tpu.sketch.extra import SuperMinHash
    vals = rng.integers(0, 2**62, 5000, dtype=np.uint64)
    a = SuperMinHash(p=8)
    a.add_np(vals)
    b = SuperMinHash(p=8)
    for part in np.array_split(rng.permutation(vals), 7):
        b.add_np(part)
    np.testing.assert_array_equal(a.h, b.h)


def test_superminhash_merge_is_union(rng):
    from dashing_tpu.sketch.extra import SuperMinHash
    va = rng.integers(0, 2**62, 3000, dtype=np.uint64)
    vb = rng.integers(0, 2**62, 2500, dtype=np.uint64)
    u = SuperMinHash(p=7)
    u.add_np(np.concatenate([va, vb]))
    a = SuperMinHash(p=7)
    a.add_np(va)
    b = SuperMinHash(p=7)
    b.add_np(vb)
    a += b
    np.testing.assert_array_equal(a.h, u.h)


def test_superminhash_register_law(rng):
    """P(h >= x) = (1 - x/m)^n: all registers finite and < m after one
    element; cardinality MLE within KMV error bounds."""
    from dashing_tpu.sketch.extra import SuperMinHash
    s = SuperMinHash(p=9)
    n = 20000
    s.add_np(rng.integers(0, 2**62, n, dtype=np.uint64))
    assert np.isfinite(s.h).all() and (s.h >= 0).all() and (s.h < s.m).all()
    est = s.report()
    assert abs(est - n) / n < 5.0 / np.sqrt(s.m)


def test_superminhash_jaccard_accuracy(rng):
    from dashing_tpu.sketch.extra import SuperMinHash
    shared = rng.integers(0, 2**62, 6000, dtype=np.uint64)
    oa = rng.integers(0, 2**62, 6000, dtype=np.uint64)
    ob = rng.integers(0, 2**62, 6000, dtype=np.uint64)
    a = SuperMinHash(p=10)
    a.add_np(np.concatenate([shared, oa]))
    b = SuperMinHash(p=10)
    b.add_np(np.concatenate([shared, ob]))
    ji = a.jaccard_index(b)
    assert abs(ji - 1 / 3) < 0.06      # ~4 sigma at m=1024


def test_superminhash_roundtrip(tmp_path, rng):
    from dashing_tpu.sketch.extra import SuperMinHash
    s = SuperMinHash(p=7, b=16)
    s.add_np(rng.integers(0, 2**62, 500, dtype=np.uint64))
    path = str(tmp_path / "s.bbs")
    s.write(path)
    t = SuperMinHash.read(path)
    assert t.p == s.p and t.b == s.b
    np.testing.assert_array_equal(t.h, s.h)


def test_superminhash_batch_compare(rng):
    from dashing_tpu.sketch.extra import SuperMinHash
    from dashing_tpu.sketch import batch_compare
    base = rng.integers(0, 2**62, 4000, dtype=np.uint64)
    sketches = []
    for i in range(5):
        s = SuperMinHash(p=7)
        s.add_np(np.concatenate(
            [base[: 1000 + 500 * i],
             rng.integers(0, 2**62, 300 * i + 10, dtype=np.uint64)]))
        sketches.append(s)
    sketches.append(SuperMinHash(p=7))     # empty
    rect = batch_compare.batch_triples(sketches, sketches)
    for i in range(6):
        for j in range(6):
            np.testing.assert_allclose(
                rect[i, j],
                np.asarray(sketches[i].full_set_comparison(sketches[j])),
                rtol=1e-12, atol=1e-9)


def test_superminhash_cli_flag(tmp_path, rng, capsys):
    """--use-superminhash builds the REAL SuperMinHash now; old
    DensifiedMinHash (DTPUSMH1) files still load."""
    from dashing_tpu.cli import main as climain
    from dashing_tpu.cli.core import read_sketch_auto
    from dashing_tpu.sketch.extra import DensifiedMinHash, SuperMinHash
    base = "".join(rng.choice(list("ACGT"), size=4000))
    paths = []
    for i in range(2):
        p = tmp_path / f"s{i}.fa"
        p.write_text(f">s{i}\n{base}\n")
        paths.append(str(p))
    assert climain.main(["sketch", "-k", "17", "-S", "12",
                         "--use-superminhash", "-P", str(tmp_path)] + paths) == 0
    capsys.readouterr()
    import glob
    skfiles = sorted(glob.glob(str(tmp_path / "*.bbs")))
    assert skfiles
    sk = read_sketch_auto(skfiles[0], "superminhash")
    assert isinstance(sk, SuperMinHash)
    # legacy densified file loads through the same entry point
    d = DensifiedMinHash(p=6)
    d.add_np(rng.integers(0, 2**62, 200, dtype=np.uint64))
    legacy = str(tmp_path / "legacy.bbs")
    d.write(legacy)
    got = read_sketch_auto(legacy, "superminhash")
    assert isinstance(got, DensifiedMinHash)


# ---------------- device-side minhash construction (VERDICT r3 item 4) -----

def _rand_fasta(tmp_path, rng, n=4000, name="dev.fa"):
    fa = tmp_path / name
    bases = rng.choice(list("ACGTACGTN"), size=n)     # with Ns
    fa.write_text(">a\n" + "".join(bases[:n // 2]) + "\n>b\n"
                  + "".join(bases[n // 2:]) + "\n")
    return str(fa)


@pytest.mark.parametrize("enc,w", [("bonsai", 0), ("bonsai", 31),
                                   ("nthash", 0)])
def test_device_bbmh_matches_host(tmp_path, rng, enc, w):
    """Device scatter-min BBMH bucket minima must equal the host addh_np
    path bit for bit (incl. est_cardinality_)."""
    from dashing_tpu import pipeline as pl
    from dashing_tpu.sketch.setsketches import BBitMinHash
    path = _rand_fasta(tmp_path, rng)
    k = 17 if enc == "bonsai" else 33
    params = pl.SketchParams(k=k, w=w, encoding=enc)
    p = 8
    mins = pl.sketch_file_bbmh_mins(path, params, p)
    host = BBitMinHash(p=p, b=16)
    host.addh_np(pl.file_raw_kmers(path, params))
    np.testing.assert_array_equal(mins, host.mins)
    dev = BBitMinHash(p=p, b=16, mins=mins)
    dev.finalize()
    host.finalize()
    assert dev.est_cardinality_ == host.est_cardinality_


def test_device_bottomk_matches_host(tmp_path, rng):
    from dashing_tpu import pipeline as pl
    from dashing_tpu.sketch.setsketches import BottomK
    path = _rand_fasta(tmp_path, rng, n=6000)
    params = pl.SketchParams(k=21)
    kk = 128
    vals = pl.sketch_file_bottomk_values(path, params, kk)
    host = BottomK(kk)
    host.addh_np(pl.file_raw_kmers(path, params))
    host.finalize()
    np.testing.assert_array_equal(vals, host.values)


def test_scatter_min_u64_exact(rng):
    """The two-pass u64 scatter-min must equal np.minimum.at on full u64,
    incl. hi-tie resolution by lo and cross-chunk stale-lo resets."""
    import jax.numpy as jnp
    from dashing_tpu.ops.minhash_update import (empty_minhash_banks,
                                                minhash_banks_to_np,
                                                scatter_min_u64)
    m = 64
    want = np.full(m, 0xFFFFFFFFFFFFFFFF, np.uint64)
    mhi, mlo = empty_minhash_banks(m)
    for _ in range(4):   # several chunks to exercise running-state resets
        n = 500
        # force many hi-ties: draw hi from a small pool
        hi = rng.choice(np.arange(7, dtype=np.uint32) * 0x30000000, n)
        lo = rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
        idx = rng.integers(0, m, n).astype(np.int32)
        valid = rng.random(n) < 0.9
        v64 = (hi.astype(np.uint64) << np.uint64(32)) | lo.astype(np.uint64)
        np.minimum.at(want, idx[valid], v64[valid])
        mhi, mlo = scatter_min_u64(mhi, mlo, jnp.asarray(idx),
                                   (jnp.asarray(hi), jnp.asarray(lo)),
                                   jnp.asarray(valid))
    np.testing.assert_array_equal(minhash_banks_to_np(mhi, mlo), want)


def test_bottomk_candidates_keep_zero_high_word(rng):
    """Regression: a hash with hi == 0 maps to ordered-int32 MIN, whose
    arithmetic negation overflows back onto itself and sorted LAST — the
    global-minimum element silently fell out of the candidate set.  The
    bit-inverted key must keep it first."""
    import jax.numpy as jnp
    from dashing_tpu.ops.minhash_update import (bottomk_candidates,
                                                candidates_to_np)
    n = 1024
    hi = rng.integers(1 << 16, 2**32, n, dtype=np.uint64).astype(np.uint32)
    lo = rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
    hi[17] = 0            # the smallest possible high word
    lo[17] = 0xDEADBEEF
    valid = np.ones(n, bool)
    valid[18] = False
    chi, clo, _ = bottomk_candidates((jnp.asarray(hi), jnp.asarray(lo)),
                                  jnp.asarray(valid), 16)
    got = candidates_to_np(chi, clo)
    assert got[0] == (0xDEADBEEF), hex(got[0])
    # and generally: candidates == the 16 smallest by high word, with the
    # invalid lane forced to sort last exactly as the device path does
    v64 = (hi.astype(np.uint64) << np.uint64(32)) | lo.astype(np.uint64)
    order_hi = hi.copy()
    order_hi[~valid] = 0xFFFFFFFF
    v64[~valid] = 0xFFFFFFFFFFFFFFFF
    want = np.sort(v64[np.argsort(order_hi, kind="stable")[:16]])
    np.testing.assert_array_equal(np.sort(got), want)


def test_cbbmh_histogram_intersection_reflects_multiplicity(rng):
    """Doubled multiset vs single: histogram intersection ~ 0.5 (the
    CountingBottomK law, applied to bucket minima)."""
    base = rng.integers(0, 2**62, 4000, dtype=np.uint64)
    sa, sb = CountingBBitMinHash(10), CountingBBitMinHash(10)
    sa.addh_np(np.repeat(base, 2))
    sb.addh_np(base)
    hi = sa.histogram_intersection(sb)
    assert abs(hi - 0.5) < 0.05, hi
    # jaccard_index IS the weighted measure (similarity<counting final>,
    # reference src/dashing.h:142-144 precedent)
    assert sa.jaccard_index(sb) == hi


def test_cbbmh_order_chunk_and_merge_invariance(rng):
    """Bucket minima AND their multiplicities must be exactly invariant to
    insertion order, chunking, and +=-merge vs single-shot build."""
    vals = rng.integers(0, 2**60, 5000, dtype=np.uint64)
    vals = np.concatenate([vals, vals[::7], vals[::13]])  # real multiplicities
    one = CountingBBitMinHash(8)
    one.addh_np(vals)
    shuffled = vals.copy()
    rng.shuffle(shuffled)
    chunked = CountingBBitMinHash(8)
    for i0 in range(0, shuffled.size, 997):
        chunked.addh_np(shuffled[i0:i0 + 997])
    np.testing.assert_array_equal(one.mins, chunked.mins)
    np.testing.assert_array_equal(one.counts, chunked.counts)
    half_a, half_b = CountingBBitMinHash(8), CountingBBitMinHash(8)
    half_a.addh_np(shuffled[::2])
    half_b.addh_np(shuffled[1::2])
    half_a += half_b
    np.testing.assert_array_equal(one.mins, half_a.mins)
    np.testing.assert_array_equal(one.counts, half_a.counts)


def test_cbbmh_count_saturation():
    """uint16 CountType saturates at 65535 (reference src/dashing.h:218)
    instead of wrapping."""
    sk = CountingBBitMinHash(4)
    v = np.full(70000, 12345, np.uint64)
    sk.addh_np(v[:40000])
    sk.addh_np(v[40000:])
    assert sk.counts.max() == 65535


def test_cbbmh_batch_engine_matches_per_pair(rng):
    from dashing_tpu.sketch import batch_compare
    sks = []
    for i in range(5):
        sk = CountingBBitMinHash(8)
        sk.addh_np(rng.integers(0, 2**62, 2000 + 300 * i, dtype=np.uint64))
        sk.finalize()
        sks.append(sk)
    assert batch_compare.supports(sks)
    rect = batch_compare.batch_triples(sks[:3], sks)
    for i in range(3):
        for j in range(len(sks)):
            want = sks[i].full_set_comparison(sks[j])
            np.testing.assert_allclose(rect[i, j], want, rtol=1e-12,
                                       err_msg=f"pair {i},{j}")


def test_cbbmh_cache_roundtrip_cli(tmp_path, rng, capsys):
    """-W writes .cbmh cache files that later runs sniff and reuse."""
    seq = "".join(rng.choice(list("ACGT"), size=3000))
    a = tmp_path / "ca.fa"
    b = tmp_path / "cb.fa"
    a.write_text(f">a\n{seq}\n")
    b.write_text(f">b\n{seq[:1500]}"
                 f"{''.join(rng.choice(list('ACGT'), size=1500))}\n")
    args = ["dist", "-k", "21", "-S", "12", "--use-counting-bb-minhash",
            "-W", "--avoid-sorting", str(a), str(b)]
    assert climain.main(args) == 0
    first = capsys.readouterr().out
    import glob
    assert glob.glob(str(tmp_path / "*.cbmh")), "cache files missing"
    assert climain.main(args) == 0   # second run loads from cache
    assert capsys.readouterr().out == first


def test_cbbmh_matches_sequential_oracle_under_collisions(rng):
    """Tiny p + heavy duplicates: vectorized group-by must equal the
    per-element sequential (min, multiplicity) recurrence exactly."""
    from collections import defaultdict
    from dashing_tpu.hashes import wang_hash_np
    for trial in range(50):
        p = int(rng.integers(1, 5))
        n = int(rng.integers(0, 60))
        raw = rng.integers(0, 50, n).astype(np.uint64)
        sk = CountingBBitMinHash(p)
        i = 0
        while i < n:
            j = i + int(rng.integers(1, 10))
            sk.addh_np(raw[i:j])
            i = j
        h = wang_hash_np(raw)
        mins, cnts = {}, defaultdict(int)
        for hv in h:
            idx = int(hv >> np.uint64(64 - p))
            val = int((int(hv) << p) & 0xFFFFFFFFFFFFFFFF)
            if idx not in mins or val < mins[idx]:
                mins[idx], cnts[idx] = val, 1
            elif val == mins[idx]:
                cnts[idx] += 1
        for b in range(1 << p):
            if b in mins:
                assert int(sk.mins[b]) == mins[b], (trial, b)
                assert int(sk.counts[b]) == cnts[b], (trial, b)
            else:
                assert int(sk.mins[b]) == 0xFFFFFFFFFFFFFFFF
                assert sk.counts[b] == 0


def test_device_bottomk_exact_under_heavy_duplication(tmp_path, rng):
    """High-coverage input (every k-mer ~60x): repeated hashes consume
    top_k slots, so the candidate selection alone would miss distinct
    bottom-kk members; the coverage check must detect it and fall back to
    the exact chunk dedup (review finding: duplicate-blind candidates)."""
    from dashing_tpu import pipeline as pl
    from dashing_tpu.sketch.setsketches import BottomK
    read = "".join(rng.choice(list("ACGT"), size=400))
    path = tmp_path / "cov.fa"
    path.write_text("".join(f">r{i}\n{read}\n" for i in range(60)))
    params = pl.SketchParams(k=21)
    kk = 128   # 380 distinct k-mers x60 copies; 2*kk slots hold ~4 values
    vals = pl.sketch_file_bottomk_values(str(path), params, kk)
    host = BottomK(kk)
    host.addh_np(pl.file_raw_kmers(str(path), params))
    host.finalize()
    np.testing.assert_array_equal(vals, host.values)
