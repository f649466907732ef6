"""Host-side FASTA/FASTQ reading (the kseq + zlib layer of the reference).

The reference streams records through klib's kseq over gzFile with zstd
transparently wrapped behind the zlib API (reference Makefile:58-62,
src/sketch_and_cmp.h:565-570).  Here files are parsed with vectorized numpy
newline scans, which at TPU feed rates is the pragmatic host-side choice;
gzip/zstd handled by the stdlib / a gated zstandard import.

Output contract: a list of (name, sequence-bytes) records, or a single flat
uint8 array with records joined by invalid separator bytes ready for tiling
(see ops/encode.join_records).
"""
from __future__ import annotations

import gzip
import io
import os
from typing import Iterator, List, Tuple

import numpy as np

Record = Tuple[bytes, bytes]


def _open_raw(path: str) -> bytes:
    with open(path, "rb") as fp:
        head = fp.read(4)
        fp.seek(0)
        if head[:2] == b"\x1f\x8b":
            with gzip.open(fp) as gz:
                return gz.read()
        if head == b"\x28\xb5\x2f\xfd":  # zstd frame
            try:
                import zstandard  # optional; gate, don't require
                return zstandard.ZstdDecompressor().stream_reader(fp).read()
            except ImportError:
                pass
            from . import native    # native loader links libzstd if present
            raw = native.read_raw(path)
            if raw is not None:
                return raw
            raise RuntimeError(
                f"{path} is zstd-compressed but neither the zstandard "
                "module nor a zstd-enabled native loader is available")
        return fp.read()


def read_records(path: str) -> List[Record]:
    """Parse one FASTA or FASTQ file (auto-detected, optionally gz/zstd)."""
    return [(n, s) for n, _, s, _ in read_records_full(path)]


def read_records_full(path: str):
    """Full kseq-shaped records: (name, comment, seq, qual_or_None).

    name/comment split like kseq (name = up to the first whitespace,
    comment = the rest of the header line); qual is None for FASTA.
    readfilt re-emits reads with their original comment (reference
    src/readfilt.cpp:17-33), so the parser must keep it."""
    data = _open_raw(path)
    if not data:
        return []
    if data[0:1] == b">":
        return _parse_fasta(data)
    if data[0:1] == b"@":
        return _parse_fastq(data)
    raise ValueError(f"{path}: not FASTA or FASTQ (starts with {data[:1]!r})")


def _split_header(header: bytes):
    header = header.rstrip(b"\r")
    parts = header.split(None, 1)
    name = parts[0] if parts else b""
    comment = parts[1] if len(parts) > 1 else b""
    return bytes(name), bytes(comment)


def _parse_fasta(data: bytes):
    out = []
    # Split on '\n>' boundaries without copying the whole payload per record.
    chunks = data.split(b"\n>")
    for i, chunk in enumerate(chunks):
        if i == 0:
            chunk = chunk[1:]  # strip leading '>'
        if not chunk:
            continue
        nl = chunk.find(b"\n")
        if nl < 0:
            header, body = chunk, b""
        else:
            header, body = chunk[:nl], chunk[nl + 1:]
        name, comment = _split_header(header)
        seq = body.replace(b"\n", b"").replace(b"\r", b"")
        out.append((name, comment, seq, None))
    return out


def _parse_fastq(data: bytes):
    """FASTQ with full kseq record semantics (reference call sites
    src/sketch_and_cmp.h:565-570): sequence may WRAP over multiple lines
    until the '+' separator, and quality is consumed by LENGTH (not by
    line count), so '@' at the start of a quality line never starts a
    false record.  The common strict 4-line layout takes a constant-work
    fast path (1M-read files are host-parse bound)."""
    out = []
    lines = data.split(b"\n")
    i = 0
    n = len(lines)
    while i < n:
        header = lines[i]
        if not header or header == b"\r":
            i += 1
            continue
        if not header.startswith(b"@"):
            raise ValueError(f"malformed FASTQ near line {i}")
        name, comment = _split_header(header[1:])
        if i + 2 < n and lines[i + 2][:1] == b"+":
            # single-line sequence (the common layout)
            seq = lines[i + 1].rstrip(b"\r")
            i += 3                       # past the '+' line
            has_qual = True
        else:
            i += 1
            parts = []
            # kseq stops sequence accumulation at '+', '@' OR '>' — a
            # record missing its '+' separator must not swallow the next
            # record (and quality then doesn't exist for it)
            while i < n and lines[i][:1] not in (b"+", b"@", b">"):
                parts.append(lines[i].rstrip(b"\r"))
                i += 1
            seq = b"".join(parts)
            has_qual = i < n and lines[i][:1] == b"+"
            if has_qual:
                i += 1                   # '+' line
        qual = None
        if has_qual:
            qparts = []
            qlen = 0
            while i < n and qlen < len(seq):
                qline = lines[i].rstrip(b"\r")
                qparts.append(qline)
                qlen += len(qline)
                i += 1
            qual = b"".join(qparts)
        out.append((bytes(name), comment, bytes(seq), qual))
    return out



def fname_is_fq(path: str) -> bool:
    """reference src/dashing.cpp:245-248."""
    return ".fastq" in path or ".fq" in path
