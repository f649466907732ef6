"""All-pairs sketch comparison as MXU matmuls: the flagship kernel.

The reference compares sketches pair-at-a-time in OpenMP loops
(`perform_core_op`, reference src/sketch_and_cmp.h:699-710; `dist_loop`
:786-880; `partdist_loop` src/dashing.h:660-712), each pair running a scalar
Ertl estimator over 2^p registers.  That shape is hostile to TPUs.

Key identity: every pairwise register statistic the estimators need has the
form  S[i,j] = sum_r f(a[i,r]) * g(b[j,r])  for indicator functions f,g of
the register value — i.e. a DOT PRODUCT over the register axis.  Stacking
the indicator thresholds k = 0..K-1 turns the entire n x n statistics
computation into K batched (n,m)x(m,n) matmuls in bfloat16 with float32
accumulation — exactly what the MXU is built for:

    cum_union[i,j,k] = #(max(a,b) <= k) = [a<=k] . [b<=k]
    eq[i,j,k]        = #(a=k & b=k)     = [a==k] . [b==k]
    gt_a[i,j,k]      = #(a=k & a>b)     = [a==k] . [b<=k-1]
    gt_b[i,j,k]      = #(b=k & b>a)     = [b==k] . [a<=k-1]
    (lt_a, lt_b follow by complement against the marginal histograms)

These are the sufficient statistics for union cardinality, inclusion-
exclusion Jaccard, AND the joint MLE (sketch/estimators.py), so one pass
serves every emission type.  The indicator inputs are exact in bfloat16
(0/1), and counts accumulate exactly in f32 up to 2^24 registers.
"""
from __future__ import annotations

import functools
import os
import sys
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..sketch import estimators as est

# ---------------------------------------------------------------------------
# Statistics kernels
# ---------------------------------------------------------------------------


def _dot(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """(na, m) . (nb, m)^T indicator contraction on the MXU.

    int8 inputs with int32 accumulation: exact for 0/1 indicators.
    Measured (benchmarks/stats_dtype_probe.py): int8/int4/bf16/f32 all
    run at the SAME rate through this toolchain at the (1024, 16384)
    geometry — the int paths do not unlock extra MAC throughput here, so
    int8 is kept for exactness + half the operand bytes, not speed."""
    return jax.lax.dot_general(
        x.astype(jnp.int8), y.astype(jnp.int8),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.float32)


@functools.partial(jax.jit,
                   static_argnames=("kmin", "kmax", "joint", "same"))
def pair_stats(a: jnp.ndarray, b: jnp.ndarray, kmax: int, joint: bool,
               kmin: int = 0, same: bool = False) -> Dict[str, jnp.ndarray]:
    """Pairwise register statistics for all (i, j).

    a: (na, m) int32 registers; b: (nb, m).  Levels kmin..kmax are resolved;
    exact when kmin <= min register and kmax >= max register (register
    values cluster in ~a dozen levels, so a tight [kmin, kmax] cuts the
    matmul count several-fold).  Returns dict of (na, nb, kmax-kmin+1)
    float32 stacks (+ marginals), tagged with kmin for padding.

    same=True asserts a and b are the SAME register bank (diagonal tiles
    of the all-pairs grid): then Z[k] = Y[k]^T exactly (Z[k][i,j] =
    #(a_i<=k-1 & a_j<=k) = Y[k][j,i]), so the joint statistics need 2
    matmul families per level instead of 3 — a 1/3 cut in the dominant
    -J cost for the common n <= tile production case.
    """
    levels = jnp.arange(kmin, kmax + 1, dtype=a.dtype)
    if joint and not same:
        fused = _pallas_joint_stats(a, b, kmin, kmax)
        if fused is not None:
            fused["hist_a"] = (a[..., :, None] == levels).astype(
                jnp.float32).sum(-2)
            fused["hist_b"] = (b[..., :, None] == levels).astype(
                jnp.float32).sum(-2)
            return fused
    # All five joint statistics are differences of THREE cumulative matmul
    # families (fewer MXU calls and half the materialized indicators of the
    # naive one-matmul-per-stat formulation; exact — integer counts in f32):
    #   X[k] = #(a<=k & b<=k),  Y[k] = #(a<=k & b<=k-1),  Z[k] = #(a<=k-1 & b<=k)
    #   eq[k]   = X[k] - Y[k] - Z[k] + X[k-1]
    #   gt_a[k] = Y[k] - X[k-1]          (a = k, b < k)
    #   gt_b[k] = Z[k] - X[k-1]          (b = k, a < k)
    # At k = kmin, a<=kmin-1 / b<=kmin-1 may be nonempty only for padded
    # zero-register rows (mesh path), whose output rows the caller trims.
    cums, eqs, gtas, gtbs = [], [], [], []
    ca_prev = a <= jnp.asarray(kmin - 1, a.dtype)
    cb_prev = b <= jnp.asarray(kmin - 1, b.dtype)
    x_prev = _dot(ca_prev, cb_prev) if joint else None
    for k in range(kmin, kmax + 1):
        lev = jnp.asarray(k, a.dtype)
        ca = a <= lev
        cb = b <= lev
        x = _dot(ca, cb)
        cums.append(x)
        if joint:
            y = _dot(ca, cb_prev)
            z = y.T if same else _dot(ca_prev, cb)
            eqs.append(x - y - z + x_prev)
            gtas.append(y - x_prev)
            # note operand order: _dot's FIRST arg indexes the output's
            # rows (the A side), so the B-side indicator goes second
            gtbs.append(z - x_prev)
            x_prev = x
        ca_prev, cb_prev = ca, cb
    out = {"cum_union": jnp.stack(cums, axis=-1)}
    if joint:
        out["eq"] = jnp.stack(eqs, axis=-1)
        out["gt_a"] = jnp.stack(gtas, axis=-1)
        out["gt_b"] = jnp.stack(gtbs, axis=-1)
    if same:
        # diagonal of X[k] IS the per-row cumulative histogram
        # (#(a_i <= k)); differencing gives the marginal histogram
        # exactly (integer counts in f32), skipping both one-hot passes
        # over the (n, m) register matrix
        d = jnp.diagonal(out["cum_union"], axis1=0, axis2=1).T  # (na, K)
        out["hist_a"] = jnp.concatenate(
            [d[..., :1], d[..., 1:] - d[..., :-1]], axis=-1)
        out["hist_b"] = out["hist_a"]
    else:
        out["hist_a"] = (a[..., :, None] == levels).astype(
            jnp.float32).sum(-2)
        out["hist_b"] = (b[..., :, None] == levels).astype(
            jnp.float32).sum(-2)
    return out


# Per-variant self-verification state for the fused union-MLE kernel:
# (estim, p, kmin, K) -> bool.  Every static-parameter combination the
# production engine requests is probed once (compile + run on a tiny
# synthetic bank THROUGH the real routing function, compare against the
# XLA inclusion-exclusion path) before production compares route through
# it, so an estimator- or geometry-specific Mosaic failure can never
# crash a run — it just falls back to XLA for that variant.
_MLE_KERNEL_STATE: Dict[tuple, bool] = {}

# ---------------------------------------------------------------------------
# Cross-process probe-verdict cache.  The per-variant self-verification
# probes are deterministic given (jax, jaxlib, platform, kernel source),
# yet every fresh CLI process re-paid their compile-load + dispatch
# round-trips — measured ~5.5 s per process on the TPU tunnel, a third
# of a clean config[1] E2E run.  Verdicts from an actual evaluation
# (match / mismatch / deterministic lowering failure) persist in a JSON
# beside the XLA compile cache, keyed by a hash of the kernel-relevant
# sources; transient backend failures are never persisted.  Disable
# with DASHING_TPU_PROBE_CACHE=0.
# ---------------------------------------------------------------------------

_PROBE_CACHE: Optional[dict] = None
_PROBE_CACHE_PATH: Optional[str] = None
_PROBE_CODE_TAG: Optional[str] = None


def _probe_code_tag() -> str:
    global _PROBE_CODE_TAG
    if _PROBE_CODE_TAG is None:
        import hashlib
        h = hashlib.sha256()
        here = os.path.dirname(os.path.abspath(__file__))
        for fn in ("pallas_mle.py", "pallas_jmle.py", "pairwise.py"):
            try:
                with open(os.path.join(here, fn), "rb") as f:
                    h.update(f.read())
            except OSError:
                h.update(b"?")
        h.update(jax.__version__.encode())
        try:
            h.update(jax.devices()[0].platform.encode())
        except Exception:
            pass
        _PROBE_CODE_TAG = h.hexdigest()[:16]
    return _PROBE_CODE_TAG


def _probe_cache_load() -> dict:
    global _PROBE_CACHE, _PROBE_CACHE_PATH
    if _PROBE_CACHE is not None:
        return _PROBE_CACHE
    if os.environ.get("DASHING_TPU_PROBE_CACHE", "1") == "0":
        _PROBE_CACHE = {}
        _PROBE_CACHE_PATH = None
        return _PROBE_CACHE
    import json
    cache_dir = os.environ.get(
        "DASHING_TPU_CACHE_DIR",
        os.path.join(os.environ.get("XDG_CACHE_HOME",
                                    os.path.join(os.path.expanduser("~"),
                                                 ".cache")),
                     "dashing_tpu_xla"))
    _PROBE_CACHE_PATH = (os.path.join(cache_dir, "probe_verdicts.json")
                         if cache_dir else None)
    data: dict = {}
    if _PROBE_CACHE_PATH:
        try:
            with open(_PROBE_CACHE_PATH) as f:
                raw = json.load(f)
            if raw.get("tag") == _probe_code_tag():
                data = raw.get("verdicts", {})
        except (OSError, ValueError):
            pass
    _PROBE_CACHE = data
    return data


def _probe_cache_store(key_str: str, verdict: bool) -> None:
    cache = _probe_cache_load()
    if _PROBE_CACHE_PATH is None:
        return       # disabled: don't even record in memory — the
                     # in-process _*_KERNEL_STATE dicts own that role
    cache[key_str] = verdict
    import json
    try:
        os.makedirs(os.path.dirname(_PROBE_CACHE_PATH), exist_ok=True)
        tmp = _PROBE_CACHE_PATH + f".tmp{os.getpid()}"
        # merge-on-write: concurrent processes lose at most an update
        merged = dict(cache)
        try:
            with open(_PROBE_CACHE_PATH) as f:
                raw = json.load(f)
            if raw.get("tag") == _probe_code_tag():
                merged = {**raw.get("verdicts", {}), **cache}
        except (OSError, ValueError):
            pass
        with open(tmp, "w") as f:
            json.dump({"tag": _probe_code_tag(), "verdicts": merged}, f)
        os.replace(tmp, _PROBE_CACHE_PATH)
    except OSError:
        pass


def _probe_driver(state: Dict[tuple, bool], key: tuple, eval_fn,
                  label: str) -> bool:
    """Shared fail-closed probe protocol for the fused kernels: run the
    eval in a fresh thread (the first kernel-path call may arrive DURING
    tracing of an enclosing jit/shard_map; JAX trace state is
    thread-local, so a fresh thread evaluates eagerly on concrete values
    — ensure_compile_time_eval instead turns the pallas_call operands
    into captured-constant tracers and fails), retry transient backend
    errors with bounded backoff, and cache a permanent per-variant
    verdict: ANY failure pins the variant to the XLA path."""
    if key in state:
        return state[key]
    key_str = f"{label}:{key}"
    persisted = _probe_cache_load().get(key_str)
    if persisted is not None:
        state[key] = bool(persisted)
        return state[key]
    import concurrent.futures
    for attempt in range(3):   # transient tunnel errors get bounded retry
        try:
            with concurrent.futures.ThreadPoolExecutor(max_workers=1) as ex:
                ok = ex.submit(eval_fn).result()
            if not ok:
                print(f"note: {label} kernel probe mismatched the XLA "
                      f"path for variant {key}; using the XLA estimator",
                      file=sys.stderr)
            state[key] = ok
            _probe_cache_store(key_str, ok)   # deterministic verdict
            return ok
        except jax.errors.JaxRuntimeError as e:
            if attempt == 2:
                print(f"note: {label} kernel probe hit persistent "
                      f"backend errors ({e}); using the XLA estimator "
                      f"for variant {key}", file=sys.stderr)
                state[key] = False   # transient: do NOT persist
                return False
            import time
            time.sleep(2.0 * (attempt + 1))
        except Exception as e:   # Mosaic lowering etc. must never be fatal
            print(f"note: {label} kernel unavailable for variant {key} "
                  f"({type(e).__name__}: {e}); using the XLA estimator",
                  file=sys.stderr)
            state[key] = False
            _probe_cache_store(key_str, False)   # deterministic lowering
            return False
    return False


def _mle_kernel_probe(estim: int, p: int, kmin: int, K: int,
                      interp: bool) -> bool:
    return _probe_driver(
        _MLE_KERNEL_STATE, (estim, p, kmin, K),
        lambda: _mle_kernel_probe_eval(estim, p, kmin, K, interp),
        "union-MLE")


def _mle_kernel_probe_eval(estim: int, p: int, kmin: int, K: int,
                           interp: bool) -> bool:
    """Probe body, run in a fresh thread (no ambient trace): tiny bank at
    the EXACT static parameters production requested, routed through
    _pallas_union_triples itself (_probing=True skips the gate)."""
    kmax = kmin + K - 1
    rng = np.random.default_rng(0)
    hi = max(kmin + 1, kmax)
    a = jnp.asarray(rng.integers(kmin, hi, size=(8, 1 << p))
                    .astype(np.int32))
    b = jnp.asarray(rng.integers(kmin, hi, size=(8, 1 << p))
                    .astype(np.int32))
    stats = pair_stats(a, b, kmax, False, kmin)

    # jit the reference path (see _jmle_kernel_probe_eval): the cards
    # feed the kernel call below, so return them too
    def _ref(s):
        cum = s["cum_union"]
        ca = est.estimate_windowed(s["hist_a"], p, kmin, estim)
        cb = est.estimate_windowed(s["hist_b"], p, kmin, estim)
        hist_u = jnp.concatenate(
            [cum[..., :1], cum[..., 1:] - cum[..., :-1]], axis=-1)
        cu = est.estimate_windowed(hist_u, p, kmin, estim)
        return ca, cb, jnp.maximum(0.0, ca[:, None] + cb[None, :] - cu)

    c_a, c_b, want_shared = jax.jit(_ref)(stats)
    want_shared = np.asarray(want_shared)
    tri = _pallas_union_triples(stats, c_a, c_b, p, kmin, estim,
                                _probing=True, _interp=interp)
    if tri is None:
        return False
    got_shared = np.asarray(tri)[..., 2]
    return bool(np.allclose(got_shared, want_shared, rtol=1e-4, atol=1.0))


def _pallas_union_triples(stats, c_a, c_b, p: int, kmin: int,
                          estim: int, _probing: bool = False,
                          _interp: bool = False):
    """Route the non-joint triple derivation through the fused
    VMEM-resident union-cardinality kernel (ops/pallas_mle.py); None ->
    XLA fallback.

    ON by default on TPU (DASHING_TPU_PALLAS_MLE=0 disables; =interpret
    forces the interpreter for CPU tests): the XLA path materializes the
    (na, nb, K) union histogram in HBM and the default ERTL_MLE Newton
    loop re-reads it every iteration."""
    import os
    if _probing:
        # the probe re-enters through the REAL routing so its layout can
        # never diverge from production; the env/platform gates were
        # already passed by the production call that triggered it
        interp = _interp
    else:
        flag = os.environ.get("DASHING_TPU_PALLAS_MLE", "1")
        if flag == "0":
            return None
        interp = flag == "interpret"
        from ..pipeline import _pallas_available
        if not (_pallas_available() or interp):
            return None
    from .pallas_mle import BB as MBB, pallas_union_triples, pick_geometry
    cum = stats["cum_union"]
    na, nb, K = cum.shape
    ba = pick_geometry(K)
    if ba is None:
        return None
    if not _probing and not _mle_kernel_probe(estim, p, kmin, K, interp):
        return None
    cumT = jnp.moveaxis(cum, -1, 0)
    pa, pb = (-na) % ba, (-nb) % MBB
    if pa or pb:
        cumT = jnp.pad(cumT, ((0, 0), (0, pa), (0, pb)))
        c_a = jnp.pad(c_a, (0, pa))
        c_b = jnp.pad(c_b, (0, pb))
    tri = pallas_union_triples(cumT, c_a, c_b, p=p, kmin=kmin,
                               method=estim, ba=ba, interpret=interp)
    tri = jnp.moveaxis(tri, 0, -1)
    return tri[:na, :nb] if (pa or pb) else tri


# Per-variant self-verification state for the fused joint-MLE kernel,
# same fail-closed discipline as _MLE_KERNEL_STATE above: every (p, kmin,
# K) bucket _tile_window can request is probed once through the real
# routing before production -J compares trust it; a Mosaic
# compiles-but-miscomputes or crash at an unprobed bucket degrades to the
# XLA vmap path instead of failing the run (VERDICT r3 weakness 2 — the
# static VMEM estimate in pick_geometry mispredicted once already).
_JMLE_KERNEL_STATE: Dict[tuple, bool] = {}


def _jmle_kernel_probe(p: int, kmin: int, K: int, interp: bool) -> bool:
    return _probe_driver(
        _JMLE_KERNEL_STATE, (p, kmin, K),
        lambda: _jmle_kernel_probe_eval(p, kmin, K, interp),
        "joint-MLE")


def _jmle_kernel_probe_eval(p: int, kmin: int, K: int, interp: bool) -> bool:
    """Probe body, run in a fresh thread: tiny bank at the EXACT static
    parameters production requested, routed through _pallas_jmle_triples
    itself (_probing=True skips the gate), compared against the XLA vmap
    joint-MLE fallback on the same statistics.

    The banks must be REALISTIC: geometric register profiles (what real
    HLLs have) with one shared register array maxed into every row so
    ALL pairs overlap.  Uniform-level or independent banks push the MLE
    into flat/ill-conditioned regions where the fixed-iteration Newton
    has not converged and the two evaluation orders legitimately return
    different points (observed 38%-of-union component drift with |dJI|
    2.7e-11 — both answers equally good, probe useless).  The comparison
    is union-NORMALIZED per component — every emitted measure is a ratio
    of triple components, so errors relative to the union size are what
    production can see; a miscompiled kernel produces wholesale garbage,
    not 1e-3-of-union noise."""
    kmax = kmin + K - 1
    rng = np.random.default_rng(0)
    m = 1 << p

    def geo_regs(rows):
        # realistic geometric register profile confined to the window:
        # rank ~ kmin + Geom(1/2), clipped so kmax >= max_reg + 1 holds
        # like production's _auto_kmax guarantees
        g = rng.geometric(0.5, size=(rows, m)) - 1 + kmin
        return np.clip(g, kmin, max(kmin, kmax - 1))

    sh = geo_regs(1)                      # common mass -> every pair overlaps
    a = jnp.asarray(np.maximum(geo_regs(8), sh).astype(np.int32))
    b = jnp.asarray(np.maximum(geo_regs(8), sh).astype(np.int32))
    stats = pair_stats(a, b, kmax, True, kmin)
    # jit the reference path: un-jitted, the vmapped Newton solve runs
    # op-by-op — hundreds of per-op tunnel round-trips on the TPU backend
    want = np.asarray(jax.jit(
        lambda s: _xla_jmle_triples(s, p, kmin))(stats))
    tri = _pallas_jmle_triples(stats, p, kmin, _probing=True,
                               _interp=interp)
    if tri is None:
        return False
    got = np.asarray(tri)
    union = np.maximum(want.sum(-1, keepdims=True), 1.0)
    return bool((np.abs(got - want) / union < 1e-3).all())


def _pallas_jmle_triples(stats, p: int, kmin: int, _probing: bool = False,
                         _interp: bool = False):
    """Route the joint-MLE Newton solve through the fused VMEM-resident
    Pallas kernel (ops/pallas_jmle.py); None -> XLA vmap fallback.

    ON by default on TPU (DASHING_TPU_PALLAS_JMLE=0 disables;
    =interpret forces the interpreter for CPU tests): the XLA Newton loop
    re-reads every statistic histogram from HBM per iteration — measured
    ~70% of the -J compare phase (benchmarks/jmle_profile.py).

    Fail-closed: the first production call at each (p, kmin, K) variant
    probes the kernel against the XLA path on a tiny bank through this
    same routing; mismatch or crash pins the variant to XLA."""
    import os
    if _probing:
        interp = _interp
    else:
        flag = os.environ.get("DASHING_TPU_PALLAS_JMLE", "1")
        if flag == "0":
            return None
        interp = flag == "interpret"
        from ..pipeline import _pallas_available
        if not (_pallas_available() or interp):
            return None
    from .pallas_jmle import BB as JBB, pallas_joint_mle, pick_geometry
    eq = stats["eq"]
    na, nb, K = eq.shape
    ba = pick_geometry(K)
    if ba is None:
        return None
    if not _probing and not _jmle_kernel_probe(p, kmin, K, interp):
        return None
    cum = stats["cum_union"]
    hist_u_w = jnp.concatenate([cum[..., :1], cum[..., 1:] - cum[..., :-1]],
                               axis=-1)
    c_a = est.mle_estimate_windowed(stats["hist_a"], p, kmin)
    c_b = est.mle_estimate_windowed(stats["hist_b"], p, kmin)
    c_u = est.improved_estimate_windowed(hist_u_w, p, kmin)
    tr = lambda x: jnp.moveaxis(x, -1, 0)
    eqT, gtaT, gtbT = tr(eq), tr(stats["gt_a"]), tr(stats["gt_b"])
    haT, hbT = stats["hist_a"].T, stats["hist_b"].T
    pa, pb = (-na) % ba, (-nb) % JBB
    if pa or pb:
        pad3 = ((0, 0), (0, pa), (0, pb))
        eqT = jnp.pad(eqT, pad3)
        gtaT = jnp.pad(gtaT, pad3)
        gtbT = jnp.pad(gtbT, pad3)
        haT = jnp.pad(haT, ((0, 0), (0, pa)))
        hbT = jnp.pad(hbT, ((0, 0), (0, pb)))
        c_a = jnp.pad(c_a, (0, pa))
        c_b = jnp.pad(c_b, (0, pb))
        c_u = jnp.pad(c_u, ((0, pa), (0, pb)))
    tri = pallas_joint_mle(eqT, gtaT, gtbT, haT, hbT, c_a, c_b, c_u,
                           p=p, kmin=kmin, iters=est.jmle_iters(p),
                           ba=ba, interpret=interp)
    tri = jnp.moveaxis(tri, 0, -1)
    return tri[:na, :nb] if (pa or pb) else tri


def _pallas_joint_stats(a: jnp.ndarray, b: jnp.ndarray, kmin: int,
                        kmax: int):
    """Route the joint statistics through the fused VMEM-resident Pallas
    kernel when enabled and the geometry allows; None -> XLA fallback.
    Counts are identical to the XLA path (exact 0/1-indicator bf16 dots
    with f32 accumulation).

    OPT-IN (DASHING_TPU_PALLAS_STATS=1): measured on v5e it matches the
    XLA X/Y/Z-difference formulation (15.5 vs 15.9 M pairs/s at 1024-tiles)
    — the 16 MiB scoped-VMEM ceiling forces 64-row blocks that underfill
    the MXU, cancelling the HBM-traffic saving.  Kept as the backend for
    targets with more VMEM per core."""
    import os
    if os.environ.get("DASHING_TPU_PALLAS_STATS", "") in ("", "0"):
        return None
    from ..pipeline import _pallas_available
    if not _pallas_available():
        return None
    from .pallas_stats import BB, pallas_pair_stats, pick_geometry
    na, m = a.shape
    nb = b.shape[0]
    K = kmax - kmin + 1
    geo = pick_geometry(m, K)
    if geo is None:
        return None
    ba, slab = geo
    pa, pb = (-na) % ba, (-nb) % BB
    a8 = jnp.minimum(a, 127).astype(jnp.int8)
    b8 = jnp.minimum(b, 127).astype(jnp.int8)
    if pa:
        a8 = jnp.pad(a8, ((0, pa), (0, 0)))
    if pb:
        b8 = jnp.pad(b8, ((0, pb), (0, 0)))
    st = pallas_pair_stats(a8, b8, kmin=kmin, kmax=kmax, ba=ba, slab=slab)
    if pa or pb:
        st = {k: v[:na, :nb] for k, v in st.items()}
    return st


@functools.partial(jax.jit, static_argnames=("p", "estim", "jestim", "kmin"))
def triples_from_stats(stats: Dict[str, jnp.ndarray], p: int,
                       estim: int, jestim: int, kmin: int = 0) -> jnp.ndarray:
    """(na, nb, 3) set triples (onlyA, onlyB, shared) for every pair."""
    cum = stats["cum_union"]
    hist_u_w = jnp.concatenate([cum[..., :1], cum[..., 1:] - cum[..., :-1]],
                               axis=-1)
    na, nb = cum.shape[0], cum.shape[1]
    if jestim != est.ERTL_JOINT_MLE:
        # windowed estimators skip the zero bins AND (window permitting)
        # the sigma/tau series — the dominant n^2 estimator cost
        c_a = est.estimate_windowed(stats["hist_a"], p, kmin, estim)
        c_b = est.estimate_windowed(stats["hist_b"], p, kmin, estim)
        fused = _pallas_union_triples(stats, c_a, c_b, p, kmin, estim)
        if fused is not None:
            return fused
        c_u = est.estimate_windowed(hist_u_w, p, kmin, estim)
        shared = jnp.maximum(0.0, c_a[:, None] + c_b[None, :] - c_u)
        only_a = jnp.maximum(c_a[:, None] - shared, 0.0)
        only_b = jnp.maximum(c_b[None, :] - shared, 0.0)
        return jnp.stack([only_a, only_b, shared], axis=-1)
    # joint MLE consumes the level window directly (no zero-padding)
    fused = _pallas_jmle_triples(stats, p, kmin)
    if fused is not None:
        return fused
    return _xla_jmle_triples(stats, p, kmin)


def _xla_jmle_triples(stats, p: int, kmin: int) -> jnp.ndarray:
    """XLA vmap joint-MLE fallback (and the probe's reference path)."""
    eq = stats["eq"]
    na, nb = eq.shape[0], eq.shape[1]
    cum = stats["cum_union"]
    hist_u_w = jnp.concatenate([cum[..., :1], cum[..., 1:] - cum[..., :-1]],
                               axis=-1)
    gt_a = stats["gt_a"]
    gt_b = stats["gt_b"]
    ha = jnp.broadcast_to(stats["hist_a"][:, None, :], eq.shape)
    hb = jnp.broadcast_to(stats["hist_b"][None, :, :], eq.shape)
    lt_a = ha - eq - gt_a
    lt_b = hb - eq - gt_b
    # Inclusion-exclusion init cardinalities: c_a/c_b depend only on the
    # row/column MARGINALS, so estimate n of them instead of n^2 (the
    # per-pair recomputation was the dominant -J init cost); the pair-
    # dependent c_u only seeds the Newton neighborhood, so the cheap
    # improved estimator (no inner Newton loop) suffices there.
    c_a = est.mle_estimate_windowed(stats["hist_a"], p, kmin)
    c_b = est.mle_estimate_windowed(stats["hist_b"], p, kmin)
    c_u = est.improved_estimate_windowed(hist_u_w, p, kmin)
    flat = lambda x: x.reshape(-1, x.shape[-1])
    sdict = dict(eq=flat(eq), gt_a=flat(gt_a), gt_b=flat(gt_b),
                 lt_a=flat(lt_a), lt_b=flat(lt_b))
    cards = (jnp.broadcast_to(c_a[:, None], (na, nb)).reshape(-1),
             jnp.broadcast_to(c_b[None, :], (na, nb)).reshape(-1),
             c_u.reshape(-1))
    tri = jax.vmap(lambda s, c: est.joint_mle(s, p, kmin=kmin, cards=c))(
        sdict, cards)
    return tri.reshape(na, nb, 3)


# ---------------------------------------------------------------------------
# Measures: the TPU rewrite of result_cmp (reference src/dashing.h:568-592).
# Emission-type codes match reference src/enums.h:13-23.
# ---------------------------------------------------------------------------

MASH_DIST = 0
JI = 1
SIZES = 2
FULL_MASH_DIST = 3
FULL_CONTAINMENT_DIST = 4
CONTAINMENT_INDEX = 5
CONTAINMENT_DIST = 6
SYMMETRIC_CONTAINMENT_INDEX = 7
SYMMETRIC_CONTAINMENT_DIST = 8

_SYMMETRIC = {MASH_DIST, JI, SIZES, FULL_MASH_DIST,
              SYMMETRIC_CONTAINMENT_INDEX, SYMMETRIC_CONTAINMENT_DIST}
_SIMILARITY = {JI, SIZES, CONTAINMENT_INDEX, SYMMETRIC_CONTAINMENT_INDEX}


def is_symmetric(result_type: int) -> bool:
    """reference src/dashing.h:393-404."""
    return result_type in _SYMMETRIC


def is_similarity(result_type: int) -> bool:
    """emt2nntype, reference src/dashing.h:267-280."""
    return result_type in _SIMILARITY


@functools.partial(jax.jit, static_argnames=("result_type",))
def measure_from_triples(tri: jnp.ndarray, result_type: int, ksinv: float
                         ) -> jnp.ndarray:
    """(..., 3) triples -> (...) float32 measure.

    Formula-for-formula replication of result_cmp (reference
    src/dashing.h:568-592) — including the reference's quirk that
    --containment-index in dist mode divides by the UNION (t0+t1+t2),
    i.e. equals Jaccard, rather than by |A| as the usage text says.
    """
    t0, t1, t2 = tri[..., 0], tri[..., 1], tri[..., 2]
    if result_type in (MASH_DIST, FULL_MASH_DIST, JI):
        denom = t0 + t1 + t2
        ji = jnp.where(denom > 0, t2 / jnp.maximum(denom, 1e-30), 0.0)
        if result_type == JI:
            return ji.astype(jnp.float32)
        ratio = 2.0 * ji / (1.0 + ji)
        if result_type == MASH_DIST:
            return jnp.where(ji > 0, -jnp.log(jnp.maximum(ratio, 1e-38)) * ksinv,
                             1.0).astype(jnp.float32)
        return (1.0 - ratio ** ksinv).astype(jnp.float32)
    if result_type == SIZES:
        return t2.astype(jnp.float32)
    if result_type in (SYMMETRIC_CONTAINMENT_INDEX, SYMMETRIC_CONTAINMENT_DIST):
        c = t2 / jnp.maximum(jnp.minimum(t0, t1) + t2, 1e-30)
        if result_type == SYMMETRIC_CONTAINMENT_INDEX:
            return c.astype(jnp.float32)
        return jnp.where(c > 0, -jnp.log(jnp.maximum(c, 1e-38)) * ksinv,
                         1.0).astype(jnp.float32)
    # CONTAINMENT_{INDEX,DIST}, FULL_CONTAINMENT_DIST
    c = t2 / jnp.maximum(t0 + t1 + t2, 1e-30)
    if result_type == CONTAINMENT_INDEX:
        return c.astype(jnp.float32)
    if result_type == CONTAINMENT_DIST:
        return jnp.where(c > 0, -jnp.log(jnp.maximum(c, 1e-38)) * ksinv,
                         1.0).astype(jnp.float32)
    return (1.0 - c ** ksinv).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Host orchestration: tiled all-pairs / rectangular comparison.
# ---------------------------------------------------------------------------

def _stack_regs(sketches) -> np.ndarray:
    return np.stack([s.regs for s in sketches]).astype(np.int32)


def _compare_mesh():
    from ..parallel.mesh import local_mesh
    return local_mesh()


def _device_regs(regs: np.ndarray) -> jnp.ndarray:
    """Upload the full register matrix ONCE as int8 (values <= 64 always
    fit) and slice tiles on device — re-uploading 16 MB register slices
    per tile dominated large-n runs over the tunnel (measured 0.1 M
    pairs/s at n=4096 before this).  Clamp before the cast: legitimate
    registers are <= 64, but a corrupt presketched file could carry values
    >= 128 which would WRAP negative in int8 and satisfy every a<=lev
    indicator instead of staying above the window.

    With >1 local device the matrix is replicated across the mesh so the
    sharded compare reshards tiles locally (no device-0 bottleneck)."""
    arr = np.minimum(regs, 127).astype(np.int8)
    mesh = _compare_mesh()
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        return jax.device_put(arr, NamedSharding(mesh, P()))
    return jnp.asarray(arr)


def _device_regs_for(sketches, regs: np.ndarray) -> jnp.ndarray:
    """Device register bank for a sketch list: when EVERY sketch carries a
    device-resident row (sk.dev_regs, parked by the mkdist fused
    presketch), stack them on device — zero host->device bank transfer;
    otherwise upload the host stack (_device_regs).  Rows are int8-clamped
    identically on both paths, so results are bitwise-equal."""
    devs = [getattr(s, "dev_regs", None) for s in sketches]
    if not devs or any(d is None for d in devs):
        return _device_regs(regs)
    # chunked stack: one 1000-operand concatenate is hard on the compiler
    parts = [jnp.stack(devs[i:i + 128]) for i in range(0, len(devs), 128)]
    arr = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
    mesh = _compare_mesh()
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        return jax.device_put(arr, NamedSharding(mesh, P()))
    return arr


@functools.lru_cache(maxsize=None)
def _sharded_compare_fn(mesh, p: int, result_type: int, ksinv: float,
                        estim: int, jestim: int, kmax: int, kmin: int):
    """jit(shard_map) building one (na, nb) measure tile with A-rows
    sharded over 'd' and B replicated — each device computes its stripe of
    the tile with the identical tuned engine, so outputs are bitwise equal
    to the single-device path (the register contraction is an exact int32
    matmul and everything after is per-pair elementwise).  The TPU-native
    replacement for dm::parallel_fill's row batches (reference
    distmat/distmat.h:459-512)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    joint = jestim == est.ERTL_JOINT_MLE

    def local(a, b):
        stats = pair_stats(a, b, kmax, joint, kmin)
        tri = triples_from_stats(stats, p, estim, jestim, kmin)
        return measure_from_triples(tri, result_type, ksinv)

    # check_vma=False: the varying-mesh-axes checker rejects pallas_call
    # outputs (their ShapeDtypeStructs carry no vma), so the fused
    # estimator kernels could not run per-shard with it on; the body is a
    # plain per-stripe map with no collectives, where the check adds
    # nothing (tests/test_mesh_production.py pins the composition)
    return jax.jit(shard_map(local, mesh=mesh,
                             in_specs=(P("d", None), P()),
                             out_specs=P("d", None), check_vma=False))


def _auto_kmax(regs: np.ndarray, q: int) -> int:
    return int(min(int(regs.max(initial=0)) + 1, q + 1))


def _auto_kmin(regs: np.ndarray) -> int:
    # initial=255, NOT 0: np.min(initial=x) is min(x, data) and registers
    # are non-negative, so initial=0 pinned every window to kmin=0 and
    # silently disabled the kmin half of the per-tile windows (review
    # finding; warm banks sit at min register ~log2(n/m) - 3)
    return int(regs.min(initial=255))


# Bucketed window widths: each distinct (kmin, kmax) pair is a separate jit
# variant (kmin/kmax are static), so the per-tile windows round kmin DOWN to
# even and the width UP to one of these — a handful of compile variants
# instead of one per tile pair, while still cutting the matmul count to
# roughly the tile's own level span (the global window pays for the union
# of ALL levels in the bank, ~25 at p=14, on every tile).
_K_BUCKETS = (8, 16, 24, 32, 44, 58, 66)


def _tile_window(tmin: int, tmax1: int, q: int):
    """Bucket a tile pair's exact level window [tmin, tmax1] for jit reuse.

    tmin must be <= every register in the tile pair and tmax1 >= the
    engine's kmax for it (tile max + 1, clamped to q+1) — the bucketing
    only ever WIDENS the window (down-rounded kmin, up-rounded width, with
    top overflow past q+1 folded into a lower kmin), and widening is exact:
    the extra levels hold empty histogram bins that contribute exact zeros
    to every windowed estimator sum."""
    # kmin rounds DOWN to a multiple of 4: now that block minima are live
    # (not constant 0), each distinct (kmin, kmax) is a separate jit
    # compile variant — /4 bucketing bounds the variant count at <= 3
    # levels of extra (exactly-zero) work per tile
    kmin = max(0, tmin - (tmin & 3))
    K = tmax1 - kmin + 1
    for b in _K_BUCKETS:
        if b >= K:
            K = b
            break
    kmax = kmin + K - 1
    if kmax > q + 1:
        kmin = max(0, kmin - (kmax - (q + 1)))
        kmax = q + 1
    return kmin, kmax


def _block_minmax(regs: np.ndarray, n: int, tile: int):
    """Per-row-block register (min, max+1-clamped) for per-tile windows."""
    return {i0: (int(regs[i0:i0 + tile].min(initial=255)),
                 int(regs[i0:i0 + tile].max(initial=0)) + 1)
            for i0 in range(0, n, tile)}


def _pair_window(mm_a, mm_b, q: int):
    """(kmax, kmin) for a tile pair — ordered for compare_tile_async."""
    lo = min(mm_a[0], mm_b[0])
    hi = min(max(mm_a[1], mm_b[1]), q + 1)
    kmin, kmax = _tile_window(lo, hi, q)
    return kmax, kmin


def compare_tile_async(regs_a: np.ndarray, regs_b: np.ndarray, p: int,
                       result_type: int, ksinv: float, estim: int,
                       jestim: int, kmax: int, kmin: int,
                       same: bool = False) -> jnp.ndarray:
    """One (na, nb) tile of the measure matrix, left on device.

    jax dispatch is asynchronous, so callers can enqueue a window of tiles
    and gather finished ones while the device works on the next — the
    compute/transfer overlap the reference gets from its double-buffered
    row writers (src/sketch_and_cmp.h:802-836).

    With >1 local device the tile's A-rows are sharded over the mesh (rows
    padded with zero registers up to a multiple of the device count; the
    garbage rows those produce are trimmed before return — every output
    row depends only on its own A row, so kept rows are untouched)."""
    from .. import metrics
    with metrics.accum("compare.dispatch"):
        return _compare_tile_async_inner(regs_a, regs_b, p, result_type,
                                         ksinv, estim, jestim, kmax, kmin,
                                         same)


def _compare_tile_async_inner(regs_a, regs_b, p, result_type, ksinv, estim,
                              jestim, kmax, kmin, same=False):
    mesh = _compare_mesh()
    if mesh is not None:
        # NOTE: the same=True diagonal-tile identity (Z = Y^T) does NOT
        # apply per shard — each device holds an A-row STRIPE against the
        # full replicated B, so its local Z block is #(a_stripe<=k-1 &
        # b<=k), which is a rectangular slice of Y^T, not a transpose of
        # anything it computed.  Diagonal tiles on the mesh therefore pay
        # the 3-family joint cost; a row-offset-aware slicing of a
        # device-shared Y could recover the cut if multi-chip profiles
        # ever show it matters.
        D = mesh.size
        a = jnp.asarray(regs_a)
        na = a.shape[0]
        pad = (-na) % D
        if pad:
            a = jnp.pad(a, ((0, pad), (0, 0)))
        out = _sharded_compare_fn(mesh, p, result_type, float(ksinv),
                                  estim, jestim, kmax, kmin)(
            a, jnp.asarray(regs_b))
        return out[:na] if pad else out
    stats = pair_stats(jnp.asarray(regs_a), jnp.asarray(regs_b), kmax,
                       jestim == est.ERTL_JOINT_MLE, kmin, same)
    tri = triples_from_stats(stats, p, estim, jestim, kmin)
    return measure_from_triples(tri, result_type, ksinv)


def compare_tile(regs_a: np.ndarray, regs_b: np.ndarray, p: int,
                 result_type: int, ksinv: float, estim: int, jestim: int,
                 kmax: Optional[int] = None, kmin: int = 0) -> np.ndarray:
    """One (na, nb) tile of the measure matrix."""
    q = 64 - p
    if kmax is None:
        kmax = max(_auto_kmax(regs_a, q), _auto_kmax(regs_b, q))
        kmin = min(_auto_kmin(regs_a), _auto_kmin(regs_b))
    return np.asarray(compare_tile_async(regs_a, regs_b, p, result_type,
                                         ksinv, estim, jestim, kmax, kmin))


_TILE_WINDOW = 4          # async tiles in flight during all-pairs loops

# Tile-row width of every compare loop.  The multi-host stripe split
# computes block ownership from the same value, so every process of a
# distributed run must see the same setting.  Env-tunable mostly so the
# 2-process tests can exercise REAL multi-rank stripes with tiny inputs.
DEFAULT_TILE = int(os.environ.get("DASHING_TPU_COMPARE_TILE", "1024"))


def _windowed(tiles, writeback, window: int = _TILE_WINDOW, redo=None):
    """Drive (key, device_future) pairs keeping `window` tiles in flight;
    `writeback(key, np_block)` lands each finished tile.  Tuple payloads
    (e.g. top-k (vals, idx)) convert per element, keeping each dtype.

    redo(key) -> device_future, when given, rebuilds a tile whose pull hit
    a transient backend error (observed as FAILED_PRECONDITION over real
    TPU tunnels): tile compute is pure, so re-dispatch is idempotent, and
    a hiccup no longer loses a whole matrix after the sketch phase
    (SURVEY.md sec 5.3).  Bounded attempts, fail-loud after the last.

    Pull coalescing (DASHING_TPU_COALESCE_PULLS=1, default OFF): finished
    same-shape tiles are stacked into ONE device buffer and pulled with a
    single transfer per window instead of one per tile; the flush point
    is held at 2*window in-flight tiles so the device keeps computing the
    next window while the previous one lands.  Measured (round 4,
    in-process alternating A/B at n=4096 -J, 4 reps each): NO improvement
    over this tunnel — median 0.46 M pairs/s coalesced vs 0.51
    uncoalesced, same-minute pairs within weather noise — because the
    link is BANDWIDTH-bound (~40-160 MB/s), not per-pull-latency-bound:
    one 16 MB stacked pull costs what four 4 MB pulls cost, plus a stack
    dispatch.  Kept off by default and behind the flag for transports
    where per-pull latency dominates instead."""
    import time as _time
    from collections import deque
    import jax

    coalesce = os.environ.get("DASHING_TPU_COALESCE_PULLS", "0") != "0"

    def to_np(d):
        # elementwise for tuples: np.asarray on the tuple itself would
        # stack mixed dtypes into one promoted float64 array
        from .. import metrics
        with metrics.accum("compare.pull"):
            return (tuple(np.asarray(x) for x in d) if isinstance(d, tuple)
                    else np.asarray(d))

    def pull(k, d):
        try:
            return to_np(d)
        except jax.errors.JaxRuntimeError:
            if redo is None:
                raise
        for attempt in range(3):
            try:
                return to_np(redo(k))
            except jax.errors.JaxRuntimeError:
                if attempt == 2:
                    raise
                _time.sleep(2.0 * (attempt + 1))

    def land(k, d):
        writeback(k, pull(k, d))

    def flush(batch):
        """Land a finished window: one stacked pull per same-shape group
        of plain-array tiles; tuples and odd shapes pull individually."""
        groups: dict = {}
        order = []
        for k, d in batch:
            if isinstance(d, tuple) or not hasattr(d, "shape"):
                order.append((k, d, None, None))
            else:
                sig = (d.shape, str(d.dtype))
                groups.setdefault(sig, []).append(len(order))
                order.append((k, d, sig, None))
        for sig, idxs in groups.items():
            if len(idxs) < 2:
                continue
            try:
                stacked = np.asarray(jnp.stack([order[i][1] for i in idxs]))
            except jax.errors.JaxRuntimeError:
                continue          # transient: fall through to per-tile pulls
            for pos, i in enumerate(idxs):
                k, d, s, _ = order[i]
                order[i] = (k, d, s, stacked[pos])
        for k, d, _, got in order:
            if got is not None:
                writeback(k, got)
            else:
                land(k, d)

    pending: deque = deque()
    if coalesce:
        for key, dev in tiles:
            pending.append((key, dev))
            if len(pending) >= 2 * window:
                batch = [pending.popleft() for _ in range(window)]
                flush(batch)
        while pending:
            flush([pending.popleft() for _ in range(min(window,
                                                        len(pending)))])
        return
    for key, dev in tiles:
        pending.append((key, dev))
        if len(pending) >= window:
            land(*pending.popleft())
    while pending:
        land(*pending.popleft())


def all_pairs_condensed(sketches, result_type: int, k: int,
                        estim: int, jestim: int, tile: int = DEFAULT_TILE,
                        out: Optional[np.ndarray] = None,
                        row_blocks: Optional[Sequence[int]] = None
                        ) -> np.ndarray:
    """Full symmetric comparison -> condensed upper-triangular vector of
    length n(n-1)/2, ordered like the reference's DistanceMatrix
    (reference distmat/distmat.h:260-264 row-major upper triangle).

    `out` may be a preallocated array — in particular an
    io.distmat.create_binary_mmap memmap, which streams finished tiles
    straight to the page cache while the device computes the next ones.

    `row_blocks` restricts the computation to tile-row starts i0 drawn
    from range(0, n, tile) — the multi-host stripe split (each process
    computes its own row blocks and writes disjoint condensed ranges,
    mirroring the reference's parallel_fill stripe discipline,
    distmat/distmat.h:459-512).  Entries outside the owned rows are left
    untouched."""
    regs = _stack_regs(sketches)
    n = regs.shape[0]
    p = sketches[0].p
    ksinv = 1.0 / k
    q = 64 - p
    # Per-tile level windows: each tile pair resolves only ITS rows' level
    # span (bucketed, _tile_window) instead of the whole bank's — the
    # stats matmul count per tile drops to the local span, the dominant
    # -J cost (the estimators are windowed and exact for any window that
    # covers the tile's registers).
    mm = _block_minmax(regs, n, tile)
    if out is None:
        out = np.empty(n * (n - 1) // 2, np.float32)
    assert out.shape == (n * (n - 1) // 2,)

    def put(i0, j0, block):
        # scatter block values for pairs (i, j) with global j > i — one
        # vectorized fancy-index store per tile (the per-row loop this
        # replaces cost ~1024 python iterations per tile, visible once
        # the device side runs at in-jit rates)
        bi, bj = block.shape
        gi = (i0 + np.arange(bi, dtype=np.int64))[:, None]
        gj = (j0 + np.arange(bj, dtype=np.int64))[None, :]
        idx = (gi * (2 * n - gi - 1)) // 2 + gj - gi - 1
        if j0 >= i0 + bi:         # strictly off-diagonal: all pairs valid
            out[idx.reshape(-1)] = block.reshape(-1)
        else:
            sel = gj > gi
            out[idx[sel]] = block[sel]

    regs_d = _device_regs_for(sketches, regs)

    def one(i0, j0):
        return compare_tile_async(
            regs_d[i0:i0 + tile], regs_d[j0:j0 + tile], p,
            result_type, ksinv, estim, jestim,
            *_pair_window(mm[i0], mm[j0], q), same=(i0 == j0))

    rows = (range(0, n, tile) if row_blocks is None
            else sorted(row_blocks))
    _windowed((((i0, j0), one(i0, j0))
                for i0 in rows
                for j0 in range(i0, n, tile)),
               lambda key, block: put(key[0], key[1], block),
               redo=lambda key: one(*key))
    return out


def rect_pairs(ref_sketches, query_sketches, result_type: int, k: int,
               estim: int, jestim: int, tile: int = DEFAULT_TILE,
               ref_blocks: Optional[Sequence[int]] = None) -> np.ndarray:
    """Query x reference rectangular comparison -> (nq, nr) matrix.

    Matches partdist_loop's orientation: row = query, entry j =
    result_cmp(ref[j], query) (reference src/dashing.h:678-681).

    `ref_blocks` restricts to reference tile starts i0 (multi-host column
    stripes); columns outside the owned blocks stay uninitialized."""
    rr = _stack_regs(ref_sketches)
    qq = _stack_regs(query_sketches)
    p = ref_sketches[0].p
    ksinv = 1.0 / k
    q = 64 - p
    nq, nr = qq.shape[0], rr.shape[0]
    mm_r = _block_minmax(rr, nr, tile)
    mm_q = _block_minmax(qq, nq, tile)
    out = (np.zeros if ref_blocks is not None else np.empty)(
        (nq, nr), np.float32)   # zeros: unowned stripes must gather clean
    rr_d, qq_d = _device_regs(rr), _device_regs(qq)
    # triple order: lhs = reference, rhs = query (result_cmp(hlls[j], hq))
    def one(i0, j0):
        return compare_tile_async(
            rr_d[i0:i0 + tile], qq_d[j0:j0 + tile], p, result_type,
            ksinv, estim, jestim, *_pair_window(mm_r[i0], mm_q[j0], q))

    ref_starts = (range(0, nr, tile) if ref_blocks is None
                  else sorted(ref_blocks))
    _windowed((((i0, j0), one(i0, j0))
                for i0 in ref_starts
                for j0 in range(0, nq, tile)),
               lambda key, block: out.__setitem__(
                   (slice(key[1], key[1] + tile),
                    slice(key[0], key[0] + tile)), block.T),
               redo=lambda key: one(*key))
    return out


def rect_triples(ref_sketches, query_sketches, estim: int, jestim: int,
                 tile: int = DEFAULT_TILE,
                 ref_blocks: Optional[Sequence[int]] = None) -> np.ndarray:
    """Query x reference set triples -> (nq, nr, 3) float32 (onlyREF,
    onlyQUERY, shared), same orientation as rect_pairs (lhs = reference).

    Feeds consumers that need several derived measures per pair at once
    (panel: containment AND Jaccard) from ONE tiled batched pass — the
    per-pair ertl_joint dispatch loop cost ~6-9 ms of tunnel RTT per pair
    (a 1,000-sketch DB was ~10 s per query)."""
    rr = _stack_regs(ref_sketches)
    qq = _stack_regs(query_sketches)
    p = ref_sketches[0].p
    q = 64 - p
    nq, nr = qq.shape[0], rr.shape[0]
    mm_r = _block_minmax(rr, nr, tile)
    mm_q = _block_minmax(qq, nq, tile)
    joint = jestim == est.ERTL_JOINT_MLE
    out = (np.zeros if ref_blocks is not None else np.empty)(
        (nq, nr, 3), np.float32)   # zeros: unowned stripes gather clean
    rr_d, qq_d = _device_regs(rr), _device_regs(qq)

    def one(i0, j0):
        kmax, kmin = _pair_window(mm_r[i0], mm_q[j0], q)
        stats = pair_stats(rr_d[i0:i0 + tile], qq_d[j0:j0 + tile],
                           kmax, joint, kmin)
        return triples_from_stats(stats, p, estim, jestim, kmin)

    ref_starts = (range(0, nr, tile) if ref_blocks is None
                  else sorted(ref_blocks))
    _windowed((((i0, j0), one(i0, j0))
               for i0 in ref_starts
               for j0 in range(0, nq, tile)),
              lambda key, block: out.__setitem__(
                  (slice(key[1], key[1] + tile),
                   slice(key[0], key[0] + tile)),
                  block.transpose(1, 0, 2)),
              redo=lambda key: one(*key))
    return out


@functools.partial(jax.jit, static_argnames=("nn", "sim", "exclude"))
def _device_tile_topk(block, q0, j0, nn: int, sim: bool, exclude: bool):
    """(bt, qt) measure block -> per-query top-nn (vals, GLOBAL ref idx),
    reduced on device so the host pulls (qt, nn) instead of (qt, bt).
    lax.top_k is stable (ties keep the lower index), matching the dense
    stable argsort's ascending-index tie-break."""
    m = block.T                                   # (qt, bt)
    qt, bt = m.shape
    if exclude:
        qi = q0 + jnp.arange(qt)[:, None]
        rj = j0 + jnp.arange(bt)[None, :]
        m = jnp.where(qi == rj, jnp.float32(-jnp.inf if sim else jnp.inf), m)
    key = m if sim else -m
    kk = min(nn, bt)
    vals, idx = jax.lax.top_k(key, kk)
    vals = vals if sim else -vals
    if kk < nn:
        # ragged final ref tile: pad with worst-sorting sentinels — they
        # can never reach the merged top-nn (earlier full tiles already
        # supplied >= nn real candidates, and stable sorts keep real
        # entries first at equal values).  Pad idx with -1, not 0: an
        # escaped sentinel then shows up as ref -1 instead of silently
        # aliasing ref 0 (ADVICE r2 item 3).
        worst = jnp.float32(-jnp.inf if sim else jnp.inf)
        vals = jnp.pad(vals, ((0, 0), (0, nn - kk)), constant_values=worst)
        return vals, jnp.pad(idx + j0, ((0, 0), (0, nn - kk)),
                             constant_values=-1)
    return vals, idx + j0


def nn_topk(ref_sketches, query_sketches, result_type: int, k: int,
            estim: int, jestim: int, nn: int, exclude_self: bool,
            tile: int = DEFAULT_TILE, ref_blocks: Optional[Sequence[int]] = None):
    """Streaming k-nearest-neighbors in O(n_q * (nn + tile)) HOST memory —
    the full n_q x n_r matrix is never materialized (the reference streams
    rows through bounded heaps, src/sketch_and_cmp.h:712-783; round-1
    materialized the whole matrix then argsorted).

    Both axes tile (a (tile, n_q) block at large n_q explodes the
    (bt, nq, K) statistics intermediates), and each (ref-tile, query-tile)
    block is top-k-reduced ON DEVICE before the pull: the host receives
    (qt, nn) candidates instead of (qt, bt) values (n=16384 otherwise
    pulls the entire 17 GB matrix over the link).

    query_sketches may be the same list as ref_sketches (all-pairs mode);
    exclude_self then masks the diagonal exactly like the dense path
    (-inf/+inf so self sorts last).  Tie-break matches the dense stable
    argsort: lax.top_k is stable and tiles scan ascending, so equal
    values order by ascending reference index.  Returns (vals, idx) each
    (n_q, nn).

    `ref_blocks` restricts the scan to reference tile starts j0 (the
    multi-host split): the result is then each query's top-nn over ONLY
    the owned references, with GLOBAL ref indices, padded with
    (worst, -1) sentinels when the owned refs supply fewer than nn
    candidates — ready for a cross-process candidate merge."""
    rr = _stack_regs(ref_sketches)
    same = query_sketches is ref_sketches
    qq = rr if same else _stack_regs(query_sketches)
    p = ref_sketches[0].p
    ksinv = 1.0 / k
    q = 64 - p
    sim = is_similarity(result_type)
    nq, nr = qq.shape[0], rr.shape[0]
    mm_r = _block_minmax(rr, nr, tile)
    mm_q = mm_r if same else _block_minmax(qq, nq, tile)
    nn = min(nn, nr)
    nn_eff = min(nn, tile)
    rr_d = _device_regs(rr)
    qq_d = rr_d if same else _device_regs(qq)
    worst = -np.inf if sim else np.inf
    best_v = np.full((nq, 0), worst, np.float32)
    best_i = np.zeros((nq, 0), np.int64)
    staged_v = np.empty((nq, nn_eff), np.float32)
    staged_i = np.empty((nq, nn_eff), np.int64)
    pending = [None]          # j0 whose candidates are currently staging

    def merge():
        nonlocal best_v, best_i
        cat_v = np.concatenate([best_v, staged_v], axis=1)
        cat_i = np.concatenate([best_i, staged_i], axis=1)
        order = np.argsort(-cat_v if sim else cat_v, axis=1,
                           kind="stable")[:, :nn]
        best_v = np.take_along_axis(cat_v, order, axis=1)
        best_i = np.take_along_axis(cat_i, order, axis=1)

    def one(j0, q0):
        block = compare_tile_async(
            rr_d[j0:j0 + tile], qq_d[q0:q0 + tile], p, result_type,
            ksinv, estim, jestim, *_pair_window(mm_r[j0], mm_q[q0], q),
            same=(same and j0 == q0))
        return _device_tile_topk(block, q0, j0, nn_eff, sim, exclude_self)

    ref_starts = (range(0, nr, tile) if ref_blocks is None
                  else sorted(ref_blocks))

    def tiles():
        for j0 in ref_starts:
            for q0 in range(0, nq, tile):
                yield ((j0, q0), one(j0, q0))

    def land(key, vi):
        j0, q0 = key
        if pending[0] is not None and j0 != pending[0]:
            merge()               # previous ref tile fully staged
        pending[0] = j0
        v, i = vi
        qt = min(tile, nq - q0)
        staged_v[q0:q0 + qt] = np.asarray(v, np.float32)[:qt]
        staged_i[q0:q0 + qt] = np.asarray(i, np.int64)[:qt]

    _windowed(tiles(), land, redo=lambda key: one(*key))
    if pending[0] is not None:
        merge()
    return pad_nn_candidates(best_v, best_i, nn, worst)


def pad_nn_candidates(best_v: np.ndarray, best_i: np.ndarray, nn: int,
                      worst):
    """Pad a k-NN candidate list to a fixed (nq, nn) with (worst, -1)
    sentinels — a ref_blocks shard can own fewer than nn references (or
    none), and the cross-process gather in distributed.combine_nn needs
    ONE shape on every rank.  The sentinel contract (-1 id, worst-sorting
    value) is shared with combine_nn's merge; change them together."""
    if best_v.shape[1] < nn:
        padw = nn - best_v.shape[1]
        best_v = np.pad(best_v, ((0, 0), (0, padw)), constant_values=worst)
        best_i = np.pad(best_i, ((0, 0), (0, padw)), constant_values=-1)
    return best_v, best_i


def full_square(sketches, result_type: int, k: int, estim: int, jestim: int,
                tile: int = DEFAULT_TILE) -> np.ndarray:
    """(n, n) square matrix with 0 diagonal (FULL_TSV path,
    reference src/sketch_and_cmp.h:851-877).

    Symmetric measures compute only the upper-triangle tiles and mirror
    the transpose on the host — half the device work of the full grid."""
    regs = _stack_regs(sketches)
    n = regs.shape[0]
    p = sketches[0].p
    ksinv = 1.0 / k
    q = 64 - p
    sym = is_symmetric(result_type)
    mm = _block_minmax(regs, n, tile)
    out = np.empty((n, n), np.float32)
    regs_d = _device_regs_for(sketches, regs)

    def one(i0, j0):
        return compare_tile_async(
            regs_d[i0:i0 + tile], regs_d[j0:j0 + tile], p,
            result_type, ksinv, estim, jestim,
            *_pair_window(mm[i0], mm[j0], q), same=(i0 == j0))

    def land(key, block):
        i0, j0 = key
        out[i0:i0 + tile, j0:j0 + tile] = block
        if sym and j0 > i0:
            out[j0:j0 + tile, i0:i0 + tile] = block.T

    _windowed((((i0, j0), one(i0, j0))
                for i0 in range(0, n, tile)
                for j0 in range(i0 if sym else 0, n, tile)),
               land, redo=lambda key: one(*key))
    np.fill_diagonal(out, 0.0)
    return out
