"""Regression pins for the round-5 core-path review findings."""
import jax.numpy as jnp
import numpy as np
import pytest

from dashing_tpu import u64
from dashing_tpu.ops import hll_update as hu
from dashing_tpu.sketch import estimators as est


def test_zero_mass_histogram_returns_zero():
    """A zero-mass histogram satisfies both the 'empty' and 'full' masks;
    the empty verdict must win (f64 oracle mle_estimate_np returns 0.0,
    the device path used to return inf)."""
    for p in (10, 14):
        q = 64 - p
        z = jnp.zeros(q + 2)
        assert float(est.mle_estimate(z, p)) == 0.0
        zw = jnp.zeros(5)
        assert float(est.mle_estimate_windowed(zw, p, kmin=3)) == 0.0


def test_solve3_sym_negative_tiny_det_finite():
    """The singular-det floor must keep the SIGN: sign(det)*1e-30 + 1e-30
    was exactly 0.0 for tiny negative determinants, making the Newton
    step inf/nan for the near-singular case the guard exists for."""
    # symmetric matrix with det ~ -2.5e-31 (a=1e-10, d=-5e-11, f=5e-11)
    H = jnp.array([[1e-10, 0.0, 0.0],
                   [0.0, -5e-11, 0.0],
                   [0.0, 0.0, 5e-11]])
    g = jnp.array([1.0, 1.0, 1.0])
    x = est._solve3_sym(H, g)
    assert np.isfinite(np.asarray(x)).all()


def test_bucket_rank_rejects_p32():
    h = (jnp.zeros(4, jnp.uint32), jnp.zeros(4, jnp.uint32))
    with pytest.raises(ValueError, match="31"):
        hu.bucket_rank(h, 32)
    idx, rank = hu.bucket_rank(h, 31)     # 31 stays valid
    assert int(jnp.max(idx)) >= 0


def test_full_vs_windowed_estimators_agree(rng):
    """The full-histogram estimators and their *_windowed(kmin=0) twins
    are intentionally SEPARATE implementations (different reduction
    orders -> last-ulp f32 differences; delegating would shift emitted
    digits and golden files).  This pin bounds the allowed drift so the
    two cannot diverge materially without a test failing."""
    import jax.numpy as jnp
    for p in (10, 14):
        q = 64 - p
        for _ in range(10):
            C = jnp.asarray(rng.multinomial(
                1 << p, np.ones(q + 2) / (q + 2)).astype(np.float64))
            for full, win in ((est.mle_estimate, est.mle_estimate_windowed),
                              (est.original_estimate,
                               est.original_estimate_windowed),
                              (est.improved_estimate,
                               est.improved_estimate_windowed)):
                a, b = float(full(C, p)), float(win(C, p, 0))
                assert a == pytest.approx(b, rel=1e-5), (p, full.__name__)


def test_kset_constructor_dedupes():
    """intersect1d(assume_unique=True) demands unique keys; the public
    constructor must dedupe (duplicates used to give JI = 2.0)."""
    from dashing_tpu.sketch.khset import KSet
    a = KSet(np.array([5, 5, 7], np.uint64))
    b = KSet(np.array([5], np.uint64))
    assert a.keys.size == 2
    assert a.jaccard_index(b) == pytest.approx(0.5)


def test_flatten_length_mismatch_raises(tmp_path):
    from dashing_tpu.io import distmat
    p = str(tmp_path / "m.bin")
    distmat.write_binary(p, np.array([0.5, 0.25, 0.125], np.float32), 3)
    with pytest.raises(ValueError, match="k values"):
        distmat.flatten_all([p], str(tmp_path / "f.bin"), [15, 17])


def test_flatten_nsets_matches_reference_bytes(tmp_path):
    """The nsets u64 must hold fpaths.size() like the reference writer
    (flatten_all.cpp:30), and readers must derive the genome count from
    the entry count."""
    import struct
    from dashing_tpu.io import distmat
    ps = []
    for i in range(2):
        p = str(tmp_path / f"m{i}.bin")
        distmat.write_binary(p, np.arange(6, dtype=np.float32) + i, 4)
        ps.append(p)
    out = str(tmp_path / "f.bin")
    distmat.flatten_all(ps, out, [15, 17])
    raw = open(out, "rb").read()
    assert struct.unpack("<I", raw[:4])[0] == 2          # nk
    assert struct.unpack("<Q", raw[4:12])[0] == 6        # ne
    assert struct.unpack("<Q", raw[12:20])[0] == 2       # nsets == nk!
    n, ks, data = distmat.read_flattened(out)
    assert n == 4 and list(ks) == [15, 17]


def test_printmat_streams_bounded(tmp_path):
    """print_binary must produce the same text as the old materializing
    path while reading the condensed payload lazily (memmap)."""
    import io as _io
    from dashing_tpu.io import distmat
    rng2 = np.random.default_rng(3)
    n = 37
    cond = rng2.random(n * (n - 1) // 2).astype(np.float32)
    p = str(tmp_path / "m.bin")
    distmat.write_binary(p, cond, n)
    buf = _io.StringIO()
    distmat.print_binary(p, buf)
    # reference output: full square with zero diagonal, '%f' rows
    sq = distmat.condensed_to_square(cond, n)
    want = _io.StringIO()
    segs = distmat._row_segments(
        np.ascontiguousarray(sq).reshape(-1),
        np.full(n, n, np.int64), 2)
    for seg in segs:
        want.write(seg[1:] + "\n")
    assert buf.getvalue() == want.getvalue()


def test_batch_compare_b_tiling_exact(rng, monkeypatch):
    """Forcing a tiny B-axis budget (many chunks) must not change a
    single triple — B-chunking is per-pair independent."""
    from dashing_tpu.sketch import batch_compare as bc
    from dashing_tpu.sketch.setsketches import BBitMinHash, BloomFilter
    sks = []
    for i in range(9):
        s = BBitMinHash(p=8, b=16)
        s.addh_np(rng.integers(0, 2**63, 300, dtype=np.uint64))
        s.finalize()
        sks.append(s)
    want = bc.batch_triples(sks, sks)
    monkeypatch.setenv("DASHING_TPU_HOST_TILE_MB", "0.000001")
    got = bc.batch_triples(sks, sks)
    assert np.array_equal(np.asarray(want), np.asarray(got))
    bfs = []
    for i in range(5):
        s = BloomFilter(nbits_log2=10, nhashes=3)
        s.addh_np(rng.integers(0, 2**63, 200, dtype=np.uint64))
        bfs.append(s)
    monkeypatch.delenv("DASHING_TPU_HOST_TILE_MB")
    want = bc.batch_triples(bfs, bfs)
    monkeypatch.setenv("DASHING_TPU_HOST_TILE_MB", "0.000001")
    got = bc.batch_triples(bfs, bfs)
    assert np.array_equal(np.asarray(want), np.asarray(got))


def test_saturated_bloom_matches_per_pair(rng):
    """A saturated bloom filter reports inf; the batched engine must
    match the per-pair path's max(0.0, nan) = 0.0 shared component
    instead of emitting NaN, and the cardinality TSV must not crash."""
    import io as _io
    from dashing_tpu.cli import core
    from dashing_tpu.sketch import batch_compare as bc
    from dashing_tpu.sketch.setsketches import BloomFilter
    full = BloomFilter(nbits_log2=6, nhashes=2)
    full.bits = np.full_like(full.bits, np.uint64(0xFFFFFFFFFFFFFFFF))
    normal = BloomFilter(nbits_log2=6, nhashes=2)
    normal.addh_np(rng.integers(0, 2**63, 5, dtype=np.uint64))
    tri = np.asarray(bc.batch_triples([full, normal], [full, normal]))
    per_pair = np.array([[full.full_set_comparison(full),
                          full.full_set_comparison(normal)],
                         [normal.full_set_comparison(full),
                          normal.full_set_comparison(normal)]])
    assert np.array_equal(tri, per_pair), (tri, per_pair)
    buf = _io.StringIO()
    core.emit_cardinalities(buf, ["a", "b"], [full, normal])
    assert "\tinf" in buf.getvalue()


def test_check_compatible_rejects_mixed_geometry():
    from dashing_tpu.cli import core
    from dashing_tpu.sketch.setsketches import BBitMinHash, BloomFilter
    with pytest.raises(SystemExit, match="register widths"):
        core.check_compatible([BBitMinHash(p=8, b=8),
                               BBitMinHash(p=8, b=16)])
    with pytest.raises(SystemExit, match="bloom"):
        core.check_compatible([BloomFilter(nbits_log2=10, nhashes=3),
                               BloomFilter(nbits_log2=12, nhashes=3)])


def _write_genomes(tmp_path, rng, n=3, L=3000):
    names = []
    for i in range(n):
        p = tmp_path / f"rg{i}.fa"
        p.write_text(">g%d\n%s\n" % (
            i, "".join(rng.choice(list("ACGT"), L))))
        names.append(str(p))
    return names


def test_mkdist_user_k_does_not_override_per_k(tmp_path, rng, monkeypatch):
    """A stray -k in the dist options must NOT win over the injected
    per-k flag (it used to: every pass silently computed at the user k)."""
    from dashing_tpu.cli import main as climain
    from dashing_tpu.io import distmat
    genomes = _write_genomes(tmp_path, rng)
    monkeypatch.chdir(tmp_path)
    assert climain.main(["mkdist", "--multik", "a,15,19,2", "-S", "11",
                         "--avoid-sorting"] + genomes) == 0
    assert climain.main(["mkdist", "--multik", "b,15,19,2", "-S", "11",
                         "-k", "17", "--avoid-sorting"] + genomes) == 0
    assert (tmp_path / "a.bin").read_bytes() == \
        (tmp_path / "b.bin").read_bytes()
    # and the two per-k matrices genuinely differ (different k)
    assert (tmp_path / "_a_15").read_bytes() != \
        (tmp_path / "_a_17").read_bytes()


def test_sketch_by_seq_countmin_filter_applies(tmp_path, rng, monkeypatch):
    """sketch_by_seq -b -n N must drop k-mers below N within-record
    multiplicity (it used to accept the flags and ignore them)."""
    import gzip
    from dashing_tpu.cli import main as climain
    from dashing_tpu.sketch.hll import HLL
    uniq = "".join(rng.choice(list("ACGT"), 400))
    rep = "".join(rng.choice(list("ACGT"), 60))
    (tmp_path / "r.fa").write_text(">r1\n%s\n" % (uniq + rep * 3))
    monkeypatch.chdir(tmp_path)
    assert climain.main(["sketch_by_seq", "-k", "17", "-S", "12",
                         "-o", "plain.gz", "r.fa"]) == 0
    assert climain.main(["sketch_by_seq", "-k", "17", "-S", "12",
                         "-b", "-n", "2", "-o", "filt.gz", "r.fa"]) == 0
    with gzip.open("plain.gz", "rb") as f:
        plain = HLL.read_record(f)
    with gzip.open("filt.gz", "rb") as f:
        filt = HLL.read_record(f)
    # filtered sketch keeps only the repeated block's k-mers
    assert 0 < filt.report() < plain.report()


def test_asymmetric_autoswitch_sketches_once(tmp_path, rng, monkeypatch,
                                             capsys):
    """The no-Q asymmetric promotion must alias sketches, not sketch the
    whole input list twice."""
    from dashing_tpu.cli import main as climain, core
    genomes = _write_genomes(tmp_path, rng)
    seen = {}
    orig = core.sketch_paths

    def spy(paths_list, opts):
        seen["n"] = len(paths_list)
        return orig(paths_list, opts)

    monkeypatch.setattr(core, "sketch_paths", spy)
    monkeypatch.chdir(tmp_path)
    assert climain.main(["dist", "-k", "17", "-S", "11", "--avoid-sorting",
                         "--containment-index"] + genomes) == 0
    capsys.readouterr()
    assert seen["n"] == len(genomes)


def test_jukes_cantor_user_sizes_keeps_path_pairing(tmp_path, rng,
                                                    monkeypatch, capsys):
    """A user-passed --sizes must not suppress the --avoid-sorting
    injection: the dist passes used to sort genomes by fsize while the
    JC post-pass paired the matrix with the UNSORTED path list."""
    from dashing_tpu.cli import main as climain
    from dashing_tpu.io import distmat
    monkeypatch.chdir(tmp_path)
    base = "".join(rng.choice(list("ACGT"), size=3000))
    # very different file sizes so fsize-sorting would reorder
    (tmp_path / "small.fa").write_text(">s\n" + base + "\n")
    (tmp_path / "big.fa").write_text(">b\n" + base * 4 + "\n")
    ps = ["small.fa", "big.fa"]
    assert climain.main(["mkdist", "--multik", "x,15,23,4",
                         "--jukes-cantor", "-S", "12"] + ps) == 0
    assert climain.main(["mkdist", "--multik", "y,15,23,4",
                         "--jukes-cantor", "--sizes", "-S", "12"] + ps) == 0
    capsys.readouterr()
    assert (tmp_path / "x.jcd").read_bytes() == \
        (tmp_path / "y.jcd").read_bytes()


def test_get_paths_strips_trailing_whitespace(tmp_path):
    from dashing_tpu.io import paths as P
    f = tmp_path / "fofn.txt"
    f.write_text("a.fa \nb.fa\t\n  \n")
    assert P.get_paths(str(f)) == ["a.fa", "b.fa"]


def test_update_remainder_blocks_bitwise(rng):
    """R not divisible by _BLOCK_ROWS must produce the same registers as
    the unfiltered reference scatter (the filter only skips updates that
    cannot change a register, whatever the block split)."""
    p = 12
    row = hu._ROW
    R = hu._BLOCK_ROWS + 17           # forces main blocks + remainder
    n = R * row
    hi = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32))
    lo = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32))
    valid = jnp.ones(n, bool)
    want = np.asarray(hu.update_registers(
        jnp.zeros(1 << p, jnp.int32), (hi, lo), valid, p))
    got = np.asarray(hu.update_registers_filtered(
        jnp.zeros(1 << p, jnp.int32), (hi, lo), valid, p, cap=64))
    assert np.array_equal(want, got)
