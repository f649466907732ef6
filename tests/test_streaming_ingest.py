"""Bounded-memory streaming ingest (VERDICT r4 weak #2).

The reference streams records in O(record) through kseq
(src/sketch_and_cmp.h:565-570); our batch loaders materialized the whole
decompressed file.  The streaming path (native/fastx.cpp dtpu_stream_*,
io/fasta._JoinStreamParser, pipeline._stream_file_tiles) must be
(a) byte-identical to the batch parse,
(b) tile-identical to the materializing _file_tiles (hence register-
    bitwise for every sketch family, counting filters included), and
(c) actually bounded: peak RSS on a multi-hundred-MB file stays ~O(window).
"""
import gzip
import os
import random
import subprocess
import sys
import tempfile

import numpy as np
import pytest

from dashing_tpu import pipeline
from dashing_tpu.io import fasta, native
from dashing_tpu.ops.encode import Spacer, parse_spacing

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cat(parts):
    parts = list(parts)
    return np.concatenate(parts) if parts else np.zeros(0, np.uint8)


def _write(tmp_path, name, data: bytes) -> str:
    p = os.path.join(str(tmp_path), name)
    with open(p, "wb") as f:
        f.write(data)
    return p


def _gen_fasta(rng, nrec, lo, hi, alphabet="ACGTN", width=70) -> bytes:
    out = []
    for r in range(nrec):
        L = rng.randrange(lo, hi)
        seq = "".join(rng.choice(alphabet) for _ in range(L))
        lines = [seq[i:i + width] for i in range(0, len(seq), width)]
        out.append(">rec%d desc\n%s\n" % (r, "\n".join(lines)))
    return "".join(out).encode()


def _gen_fastq(rng, nrec, lo, hi) -> bytes:
    out = []
    for r in range(nrec):
        L = rng.randrange(lo, hi)
        seq = "".join(rng.choice("ACGTN") for _ in range(L))
        out.append("@r%d c\n%s\n+\n%s\n" % (r, seq, "I" * L))
    return "".join(out).encode()


# --------------------------------------------------------------------------
# (a) stream == batch, all three parsers, stressed chunk boundaries
# --------------------------------------------------------------------------

CASES = [
    b">a\nACGTACGT\nNNNN\n>b\nTTTT\n",
    b">a\r\nACGT\r\nGG\r\n>b\r\nCC\r\n",
    b">only_header",
    b">a\nACGT",                                   # no trailing newline
    b"@r1\nACGT\n+\nIIII\n@r2\nAAAA\n+\n@@@@\n",   # '@' quality line
    b"@r1\nACGT\nCCGG\n+\nIIIIIII\nI\n@r2\nAA\n+\nII\n",  # wrapped seq+qual
    b"@r1\nACGT\n@r2\nAAAA\n+\nIIII\n",            # missing '+' separator
    b"@r\nAC\r\n+\r\nII\r\n",                      # CRLF FASTQ
    b"",
]


@pytest.mark.parametrize("data", CASES)
def test_stream_matches_batch_fixed_cases(data, tmp_path):
    path = _write(tmp_path, "x.fa", data)
    batch = native.read_joined(path, 13)
    assert batch is not None
    for chunk in (1, 3, 97, 1 << 20):
        gen = native.stream_joined(path, 13, chunk_bytes=chunk)
        assert gen is not None
        assert np.array_equal(_cat(gen), batch[0]), ("native", chunk)
        got = _cat(fasta.stream_joined(path, 13, chunk_bytes=chunk))
        assert np.array_equal(got, batch[0]), ("python", chunk)


def test_stream_matches_batch_fuzz(tmp_path):
    rng = random.Random(42)
    for trial in range(60):
        fastq = rng.random() < 0.5
        nl = "\r\n" if rng.random() < 0.3 else "\n"
        recs = []
        for r in range(rng.randrange(0, 5)):
            seqlines = ["".join(rng.choice("ACGTN")
                                for _ in range(rng.randrange(0, 12)))
                        for _ in range(rng.randrange(1, 4))]
            seq = "".join(seqlines)
            if fastq:
                qual, qs, i = "I" * len(seq), [], 0
                while i < len(qual):
                    j = min(len(qual), i + rng.randrange(1, 8))
                    qs.append(qual[i:j])
                    i = j
                recs.append("@r%d d%s%s%s+%s%s" % (
                    r, nl, nl.join(seqlines) + nl, "", nl,
                    (nl.join(qs) + nl) if qs else ""))
            else:
                recs.append(">r%d d%s%s" % (r, nl, nl.join(seqlines) + nl))
        data = "".join(recs).encode()
        path = _write(tmp_path, "f%d.fa" % trial, data)
        batch = native.read_joined(path, 9)
        assert batch is not None, data
        nat = _cat(native.stream_joined(path, 9,
                                        chunk_bytes=rng.randrange(1, 60)))
        py = _cat(fasta.stream_joined(path, 9,
                                      chunk_bytes=rng.randrange(1, 60)))
        assert np.array_equal(nat, batch[0]), data
        assert np.array_equal(py, batch[0]), data


def test_stream_gz(tmp_path):
    data = b">a\n" + b"ACGT" * 50000 + b"\n>b\nGGTT\n"
    path = _write(tmp_path, "x.fa.gz", gzip.compress(data))
    batch = native.read_joined(path, 30)
    assert np.array_equal(_cat(native.stream_joined(path, 30)), batch[0])
    assert np.array_equal(_cat(fasta.stream_joined(path, 30)), batch[0])


def test_python_stream_single_line_bounded():
    """The Python fallback parser must emit a newline-less mega-line
    incrementally (the old line-based version buffered the WHOLE line,
    defeating O(chunk) on single-line chromosome FASTAs)."""
    p = fasta._JoinStreamParser(9)
    out = p.feed(b">chr1\n")
    assert out == b""
    total = 0
    for _ in range(50):
        got = p.feed(b"ACGT" * 1000)       # no newline ever
        total += len(got)
    # all but at most a withheld-CR run must be emitted immediately
    assert total == 50 * 4000
    assert p.finish() == b""


def test_stream_zstd(tmp_path):
    """The native incremental parser must stream zstd frames too (the
    reference wraps zstd behind the zlib API, Makefile:58-62)."""
    import ctypes
    try:
        lib = ctypes.CDLL("libzstd.so.1")
    except OSError:
        pytest.skip("libzstd unavailable")
    rng = random.Random(12)
    raw = _gen_fasta(rng, 20, 1000, 5000)
    lib.ZSTD_compressBound.restype = ctypes.c_size_t
    bound = lib.ZSTD_compressBound(len(raw))
    dst = ctypes.create_string_buffer(bound)
    lib.ZSTD_compress.restype = ctypes.c_size_t
    n = lib.ZSTD_compress(dst, bound, raw, len(raw), 3)
    path = _write(tmp_path, "z.fa.zst", dst.raw[:n])
    batch = native.read_joined(path, 20)
    assert batch is not None and batch[0].size > 0
    for chunk in (333, 1 << 20):
        gen = native.stream_joined(path, 20, chunk_bytes=chunk)
        assert gen is not None
        assert np.array_equal(_cat(gen), batch[0])
    # truncated frame must error, not silently shorten
    path2 = _write(tmp_path, "t.fa.zst", dst.raw[:n // 2])
    gen = native.stream_joined(path2, 20)
    assert gen is not None
    with pytest.raises(ValueError):
        list(gen)


def test_stream_malformed_raises(tmp_path):
    path = _write(tmp_path, "bad.fa", b"garbage, not fasta\n")
    gen = native.stream_joined(path, 5)
    assert gen is not None
    with pytest.raises(ValueError):
        list(gen)
    with pytest.raises(ValueError):
        list(fasta.stream_joined(path, 5))


def test_native_pack2bit_identity(rng):
    """native/pack.cpp must match pipeline._pack_tile_host_inner
    byte-for-byte over the full byte range (it feeds the packed device
    upload path, so a single bit of drift changes sketches)."""
    from dashing_tpu.pipeline import _pack_tile_host_inner
    if native.pack2bit(np.zeros((1, 8), np.uint8)) is None:
        pytest.skip("native library unavailable")
    for trial in range(10):
        rows = int(rng.integers(1, 40))
        C = 8 * int(rng.integers(1, 120))
        tile = (rng.integers(0, 256, (rows, C), dtype=np.uint8)
                if trial % 2 else
                rng.choice(np.frombuffer(b"ACGTNacgtn\x00", np.uint8),
                           size=(rows, C)))
        a = _pack_tile_host_inner(tile)
        b = native.pack2bit(tile)
        assert np.array_equal(a[0], b[0]) and np.array_equal(a[1], b[1])


def test_iter_records_full_matches_batch(tmp_path):
    """The lazy record iterator behind readfilt/sketch_by_seq must yield
    the same (name, comment, seq, qual) tuples as read_records_full."""
    rng = random.Random(77)
    cases = list(CASES)
    for trial in range(40):
        fastq = rng.random() < 0.5
        nl = "\r\n" if rng.random() < 0.3 else "\n"
        recs = []
        for r in range(rng.randrange(0, 5)):
            seqlines = ["".join(rng.choice("ACGTN")
                                for _ in range(rng.randrange(0, 12)))
                        for _ in range(rng.randrange(1, 4))]
            seq = "".join(seqlines)
            if fastq:
                qual, qs, i = "I" * len(seq), [], 0
                while i < len(qual):
                    j = min(len(qual), i + rng.randrange(1, 8))
                    qs.append(qual[i:j])
                    i = j
                recs.append("@r%d c%d%s%s+%s%s" % (
                    r, trial, nl, nl.join(seqlines) + nl, nl,
                    (nl.join(qs) + nl) if qs else ""))
            else:
                recs.append(">r%d c%d%s%s" % (r, trial, nl,
                                              nl.join(seqlines) + nl))
        cases.append("".join(recs).encode())
    for i, data in enumerate(cases):
        path = _write(tmp_path, "it%d.fa" % i, data)
        try:
            batch = fasta.read_records_full(path)
        except ValueError:
            with pytest.raises(ValueError):
                list(fasta.iter_records_full(path, chunk_bytes=7))
            continue
        for chunk in (1, 7, 1 << 20):
            got = list(fasta.iter_records_full(path, chunk_bytes=chunk))
            assert got == list(batch), (i, chunk, data[:120])


# --------------------------------------------------------------------------
# (b) streaming _file_tiles == materializing _file_tiles, and registers
# --------------------------------------------------------------------------

def _tiles(path, sp, stream: bool):
    os.environ["DASHING_TPU_STREAM"] = "1" if stream else "0"
    try:
        return list(pipeline._file_tiles(path, sp))
    finally:
        os.environ.pop("DASHING_TPU_STREAM", None)


@pytest.mark.parametrize("k", [21, 31])
def test_file_tiles_identical(k, tmp_path):
    rng = random.Random(5)
    # > one full window (MAX_ROWS*CONTENT = 2 MiB content) to cross seams
    data = _gen_fasta(rng, 4, 600_000, 700_000)
    path = _write(tmp_path, "big.fa", data)
    sp = Spacer(k, k, parse_spacing("", k))
    a = _tiles(path, sp, stream=False)
    b = _tiles(path, sp, stream=True)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        assert x.shape == y.shape
        assert np.array_equal(x, y)


def test_file_tiles_identical_fastq_and_multipath(tmp_path):
    rng = random.Random(6)
    p1 = _write(tmp_path, "a.fq", _gen_fastq(rng, 3000, 80, 300))
    p2 = _write(tmp_path, "b.fa", _gen_fasta(rng, 5, 100_000, 200_000))
    logical = p1 + " " + p2          # reference FNAME_SEP multi-file path
    sp = Spacer(21, 21, parse_spacing("", 21))
    a = _tiles(logical, sp, stream=False)
    b = _tiles(logical, sp, stream=True)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        assert np.array_equal(x, y)


def test_streamed_registers_bitwise(tmp_path):
    """End-to-end: HLL registers and count-filtered registers bitwise-equal
    between the streaming and materializing ingest paths."""
    rng = random.Random(9)
    path = _write(tmp_path, "g.fa", _gen_fasta(rng, 3, 700_000, 800_000))
    for params in (pipeline.SketchParams(k=31),
                   pipeline.SketchParams(k=21, min_count=2,
                                         use_counting_filter=True)):
        os.environ["DASHING_TPU_STREAM"] = "0"
        try:
            regs_mat = pipeline.sketch_file_hll(path, params, 12)
        finally:
            os.environ.pop("DASHING_TPU_STREAM", None)
        os.environ["DASHING_TPU_STREAM"] = "1"
        try:
            regs_str = pipeline.sketch_file_hll(path, params, 12)
        finally:
            os.environ.pop("DASHING_TPU_STREAM", None)
        assert np.array_equal(regs_mat, regs_str), params


# --------------------------------------------------------------------------
# (c) peak RSS is bounded
# --------------------------------------------------------------------------

_RSS_CHILD = r"""
import os, resource, sys
os.environ["DASHING_TPU_PLATFORM"] = "cpu"
os.environ["DASHING_TPU_STREAM"] = sys.argv[2]
sys.path.insert(0, %r)
from dashing_tpu import pipeline
from dashing_tpu.ops.encode import Spacer, parse_spacing
sp = Spacer(31, 31, parse_spacing("", 31))
total = 0
for tile in pipeline._file_tiles(sys.argv[1], sp):
    total += int(tile[0, 0])          # consume without accumulating
print(resource.getrusage(resource.RUSAGE_SELF).ru_maxrss)
""" % REPO


def test_peak_rss_bounded(tmp_path):
    """Streaming a ~300 MB FASTA must not add more than ~120 MB over the
    interpreter+numpy baseline (the materializing path adds the whole
    file and then some)."""
    nprng = np.random.default_rng(0)
    big = os.path.join(str(tmp_path), "huge.fa")
    with open(big, "wb") as f:
        f.write(b">one\n")
        line = None
        for _ in range(30):           # 30 x ~10 MB sequence lines
            block = nprng.choice(np.frombuffer(b"ACGT", np.uint8),
                                 size=10_000_000).tobytes()
            f.write(block)
            f.write(b"\n")
    size = os.path.getsize(big)
    assert size > 250_000_000

    tiny = _write(tmp_path, "tiny.fa", b">t\n" + b"ACGT" * 100 + b"\n")

    def rss(path, stream):
        out = subprocess.run(
            [sys.executable, "-c", _RSS_CHILD, path, stream],
            capture_output=True, text=True, timeout=600,
            env={k: v for k, v in os.environ.items()
                 if k != "XLA_FLAGS"})
        assert out.returncode == 0, out.stderr[-2000:]
        return int(out.stdout.strip().splitlines()[-1]) * 1024  # KiB -> B

    base = rss(tiny, "1")
    streamed = rss(big, "1")
    overhead = streamed - base
    assert overhead < 120_000_000, (
        f"streaming ingest used {overhead / 1e6:.0f} MB over baseline "
        f"(baseline {base / 1e6:.0f} MB) on a {size / 1e6:.0f} MB file")
