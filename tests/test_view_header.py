"""`view --header` self-description across every DTPU container family
(PARITY.md "DTPU sketch container spec").  Each family round-trips:
build -> write -> header dump must carry the right magic/family/version/
fields, and the payload byte count must match the spec's formula.
"""
import gzip
import struct

import numpy as np
import pytest

from dashing_tpu.cli import main as climain


def _header_line(path, capsys):
    assert climain.main(["view", "--header", str(path)]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    return dict(kv.split("=", 1) for kv in out[0].split("\t")[1:])


def _elements(rng, n=500):
    return rng.integers(0, 2**63, n, dtype=np.uint64)


def test_header_hll(tmp_path, capsys, rng):
    from dashing_tpu.sketch.hll import HLL
    h = HLL(10)
    h.add_np(_elements(rng))
    f = tmp_path / "x.hll"
    h.write(str(f))
    d = _header_line(f, capsys)
    assert d["magic"] == "DTPUHLL1" and d["family"] == "hll"
    assert d["version"] == "1" and d["endian"] == "little"
    assert int(d["p"]) == 10
    assert int(d["payload_bytes"]) == 1 << 10


def test_header_bf(tmp_path, capsys, rng):
    from dashing_tpu.sketch.setsketches import BloomFilter
    b = BloomFilter(nbits_log2=12, nhashes=3)
    b.addh_np(_elements(rng))
    f = tmp_path / "x.bf"
    b.write(str(f))
    d = _header_line(f, capsys)
    assert d["magic"] == "DTPUBF01" and d["family"] == "bf"
    assert int(d["nbits_log2"]) == 12 and int(d["nhashes"]) == 3
    assert int(d["payload_bytes"]) == (1 << 12) // 64 * 8


def test_header_bottomk_and_counting(tmp_path, capsys, rng):
    from dashing_tpu.sketch.setsketches import BottomK, CountingBottomK
    for cls, magic, fam in ((BottomK, "DTPURMH1", "rmh"),
                            (CountingBottomK, "DTPUCRM1", "crmh")):
        sk = cls(64)
        sk.addh_np(_elements(rng))
        sk.finalize()
        f = tmp_path / f"x.{fam}"
        sk.write(str(f))
        d = _header_line(f, capsys)
        assert d["magic"] == magic and d["family"] == fam
        n = int(d["n_values"])
        assert int(d["k"]) == 64 and 0 < n <= 64
        want = 8 * n + (4 * n if cls is CountingBottomK else 0)
        assert int(d["payload_bytes"]) == want


def test_header_bbmh_families(tmp_path, capsys, rng):
    from dashing_tpu.sketch.setsketches import (BBitMinHash,
                                                CountingBBitMinHash)
    for cls, magic, fam in ((BBitMinHash, "DTPUBBM1", "bbmh"),
                            (CountingBBitMinHash, "DTPUCBB1", "cbbmh")):
        sk = cls(p=8, b=16)
        sk.addh_np(_elements(rng))
        sk.finalize()
        f = tmp_path / f"x.{fam}"
        sk.write(str(f))
        d = _header_line(f, capsys)
        assert d["magic"] == magic and d["family"] == fam
        assert int(d["p"]) == 8 and int(d["b"]) == 16
        assert int(d["payload_bytes"]) > 8     # f64 card + packed mins


def test_header_extra_families(tmp_path, capsys, rng):
    from dashing_tpu.sketch.extra import WideHLL, HyperMinHash, SuperMinHash
    w = WideHLL(9)
    w.add_np(_elements(rng))
    f = tmp_path / "x.whll"
    w.write(str(f))
    d = _header_line(f, capsys)
    assert d["magic"] == "DTPUWHL1" and int(d["p"]) == 9
    assert int(d["payload_bytes"]) == 2 * (1 << 9)

    hm = HyperMinHash(8)
    hm.addh_np(_elements(rng))
    f = tmp_path / "x.hmh"
    hm.write(str(f))
    d = _header_line(f, capsys)
    assert d["magic"] == "DTPUHMH1" and int(d["p"]) == 8
    assert int(d["payload_bytes"]) == 4 * (1 << 8)

    sm = SuperMinHash(7)
    sm.addh_np(_elements(rng))
    f = tmp_path / "x.smh"
    sm.write(str(f))
    d = _header_line(f, capsys)
    assert d["magic"] == "DTPUSMH2" and d["family"] == "superminhash"
    assert d["version"] == "2" and int(d["p"]) == 7
    assert int(d["payload_bytes"]) == 8 * (1 << 7)


def test_header_khs(tmp_path, capsys, rng):
    from dashing_tpu.sketch.khset import KSet
    vals = _elements(rng, 100)
    ks = KSet.from_values(vals)
    f = tmp_path / "x.khs"
    ks.write(str(f))
    d = _header_line(f, capsys)
    assert d["format"].startswith("khs")
    n = int(d["n_keys"])
    assert n == np.unique(vals).size
    assert int(d["payload_bytes"]) == 8 * n


def test_header_rejects_unknown(tmp_path, capsys):
    f = tmp_path / "bogus.hll"
    with gzip.open(str(f), "wb") as fp:
        fp.write(b"NOTMAGIC" + b"\x00" * 16)
    with pytest.raises(SystemExit):
        climain.main(["view", "--header", str(f)])
