"""Cross-process probe-verdict cache (ops/pairwise._probe_cache_*).

Each fresh CLI process used to re-pay the fused-kernel self-verification
probes (~5.5 s of tunnel round-trips per process, measured round 5);
deterministic verdicts now persist beside the XLA compile cache.  These
tests drive the cache against a tmp dir with the module state reset.
"""
import json
import os

import pytest

from dashing_tpu.ops import pairwise as pw


@pytest.fixture()
def probe_cache_env(tmp_path, monkeypatch):
    monkeypatch.setenv("DASHING_TPU_PROBE_CACHE", "1")
    monkeypatch.setenv("DASHING_TPU_CACHE_DIR", str(tmp_path))
    monkeypatch.setattr(pw, "_PROBE_CACHE", None)
    monkeypatch.setattr(pw, "_PROBE_CACHE_PATH", None)
    yield tmp_path
    # reset so later tests (conftest disables the cache) start clean
    pw._PROBE_CACHE = None
    pw._PROBE_CACHE_PATH = None


def test_verdicts_persist_and_reload(probe_cache_env):
    tmp = probe_cache_env
    calls = {"n": 0}

    def eval_ok():
        calls["n"] += 1
        return True

    state: dict = {}
    assert pw._probe_driver(state, (1, 2, 3), eval_ok, "t") is True
    assert calls["n"] == 1
    path = os.path.join(str(tmp), "probe_verdicts.json")
    raw = json.load(open(path))
    assert raw["tag"] == pw._probe_code_tag()
    assert raw["verdicts"]["t:(1, 2, 3)"] is True

    # a fresh "process": empty in-memory state + dropped module cache
    pw._PROBE_CACHE = None
    state2: dict = {}
    assert pw._probe_driver(state2, (1, 2, 3), eval_ok, "t") is True
    assert calls["n"] == 1          # served from disk, no re-eval


def test_mismatch_verdict_persists_but_transient_does_not(probe_cache_env):
    tmp = probe_cache_env
    state: dict = {}
    assert pw._probe_driver(state, (9,), lambda: False, "t") is False
    raw = json.load(open(os.path.join(str(tmp), "probe_verdicts.json")))
    assert raw["verdicts"]["t:(9,)"] is False

    import jax

    def transient():
        raise jax.errors.JaxRuntimeError("FAILED_PRECONDITION: tunnel")

    state3: dict = {}
    assert pw._probe_driver(state3, (7,), transient, "t") is False
    raw = json.load(open(os.path.join(str(tmp), "probe_verdicts.json")))
    assert "t:(7,)" not in raw["verdicts"]   # transient never persists


def test_stale_tag_ignored(probe_cache_env):
    tmp = probe_cache_env
    path = os.path.join(str(tmp), "probe_verdicts.json")
    json.dump({"tag": "stale", "verdicts": {"t:(5,)": False}},
              open(path, "w"))
    calls = {"n": 0}

    def eval_ok():
        calls["n"] += 1
        return True

    state: dict = {}
    assert pw._probe_driver(state, (5,), eval_ok, "t") is True
    assert calls["n"] == 1          # stale verdict was not trusted


def test_disabled_by_env(tmp_path, monkeypatch):
    monkeypatch.setenv("DASHING_TPU_PROBE_CACHE", "0")
    monkeypatch.setenv("DASHING_TPU_CACHE_DIR", str(tmp_path))
    monkeypatch.setattr(pw, "_PROBE_CACHE", None)
    monkeypatch.setattr(pw, "_PROBE_CACHE_PATH", None)
    state: dict = {}
    assert pw._probe_driver(state, (4,), lambda: True, "t") is True
    assert not os.path.exists(os.path.join(str(tmp_path),
                                           "probe_verdicts.json"))
    pw._PROBE_CACHE = None
    pw._PROBE_CACHE_PATH = None
