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
    data = _open_raw(path)
    if not data:
        return []
    if data[0:1] == b">":
        return _parse_fasta(data)
    if data[0:1] == b"@":
        return _parse_fastq(data)
    raise ValueError(f"{path}: not FASTA or FASTQ (starts with {data[:1]!r})")


def _parse_fasta(data: bytes) -> List[Record]:
    out: List[Record] = []
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
        name = header.split()[0] if header.split() else header.strip()
        seq = body.replace(b"\n", b"").replace(b"\r", b"")
        out.append((bytes(name), seq))
    return out


def _parse_fastq(data: bytes) -> List[Record]:
    """FASTQ with full kseq record semantics (reference call sites
    src/sketch_and_cmp.h:565-570): sequence may WRAP over multiple lines
    until the '+' separator, and quality is consumed by LENGTH (not by
    line count), so '@' at the start of a quality line never starts a
    false record.  The common strict 4-line layout takes a constant-work
    fast path (1M-read files are host-parse bound)."""
    out: List[Record] = []
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
        header = header.rstrip(b"\r")
        name = (header[1:].split()[0] if header[1:].split()
                else header[1:])
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
        if has_qual:
            qlen = 0
            while i < n and qlen < len(seq):
                qlen += len(lines[i].rstrip(b"\r"))
                i += 1
        out.append((bytes(name), bytes(seq)))
    return out



def fname_is_fq(path: str) -> bool:
    """reference src/dashing.cpp:245-248."""
    return ".fastq" in path or ".fq" in path
