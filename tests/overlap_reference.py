"""Independent transcription of the reference's EMA-family contracts.

Second implementations of /root/reference/src/talib/overlap.rs's present
helpers (calc_sma/ema/wma/dema/tema/t3/trima/kama), written as plain
per-value Python state machines mirroring the Rust's *validity branch*
(the branch that runs on real parquet data). Used by
tests/test_overlap_reference_parity.py to (a) pin the repo kernels to the
reference contract where the reference is standard, and (b) DOCUMENT the
reference's divergences where it is not:

* calc_wma (overlap.rs:1328-1398) updates its incremental numerator
  without the per-step ``- sum`` rebalance, so its output is correct only
  for the first full window and drifts afterwards — the repo implements
  standard WMA (divergence catalogued in SURVEY §0).
* calc_kama (overlap.rs:732-855) builds the ER denominator from a rolling
  window of |v_i − v_{i−p}| period-changes (warmup: |v_i − v_0|), not
  TA-Lib's one-step |Δv| sum, and seeds the fold with mean(v[p..2p−1])
  emitting from index 2p — the repo implements the standard ER with an
  SMA(p) seed at index p−1 (catalogued in SURVEY §0).
* calc_dema (overlap.rs:543-658) appends NULL on the second EMA's seed row
  (count == 2p−1) while calc_tema/calc_t3 emit on theirs, so the
  reference's DEMA starts one row later than its own TEMA convention; its
  no-validity branch even runs TEMA logic (indexing a 2-slot array at [2]).
  The repo emits from the seed row (2p−2), consistent with TEMA/T3.

The Rust folds use fused multiply-add (``alpha.mul_add``); these
transcriptions use plain ``a*(x-e)+e``, so value comparisons are
``allclose`` (the contraction keeps fma-vs-separate drift ~1e-15
relative), while null patterns compare exactly.
"""

from __future__ import annotations

import math


def ref_sma(v: list[float], p: int) -> list[float | None]:
    n = len(v)
    if p == 0 or n < p:
        return [None] * n
    out: list[float | None] = []
    s = 0.0
    for i in range(n):
        s += v[i]
        if i + 1 < p:
            out.append(None)
            continue
        if i + 1 > p:
            s -= v[i - p]
        out.append(s / p)
    return out


def ref_ema(v: list[float], p: int) -> list[float | None]:
    n = len(v)
    if p == 0 or n < p:
        return [None] * n
    out: list[float | None] = []
    a = 2.0 / (p + 1.0)
    s = 0.0
    e = 0.0
    for i in range(n):
        c = i + 1
        if c < p:
            s += v[i]
            out.append(None)
        elif c == p:
            s += v[i]
            e = s / p
            out.append(e)
        else:
            e = a * (v[i] - e) + e
            out.append(e)
    return out


def ref_wma(v: list[float], p: int) -> list[float | None]:
    """calc_wma VERBATIM, including its missing ``numerator -= sum``
    rebalance — correct at the first full window, drifting afterwards."""
    n = len(v)
    if p == 0 or n < p:
        return [None] * n
    out: list[float | None] = []
    denom = float(p * (p + 1) // 2)
    num = 0.0
    s = 0.0
    count = 0
    window: list[float] = []
    for i in range(n):
        count += 1
        s += v[i]
        num += count * v[i]
        window.append(v[i])
        if count < p:
            out.append(None)
            continue
        if count > p:
            old = window.pop(0)
            s -= old
            num -= p * old
            count -= 1
        out.append(num / denom)
    return out


def _chain_ema_fold(v: list[float], p: int, levels: int):
    """The shared multi-EMA warmup ladder of calc_dema/tema/t3: level k
    seeds from the SMA of level k-1's first p values; returns per-index
    tuples of the level values (None until that level is live)."""
    a = 2.0 / (p + 1.0)
    e = [0.0] * levels
    s = [0.0] * levels
    live = 0  # how many levels have seeded
    rows = []
    for i in range(len(v)):
        c = i + 1
        if c < p:
            s[0] += v[i]
            rows.append(None)
            continue
        if c == p:
            s[0] += v[i]
            e[0] = s[0] / p
            live = 1
            if levels > 1:
                s[1] = e[0]
            rows.append(tuple(e[:live]))
            continue
        e[0] = a * (v[i] - e[0]) + e[0]
        for k in range(1, levels):
            seed_at = (k + 1) * p - k  # count at which level k seeds
            if c < seed_at:
                if k == live:
                    s[k] += e[k - 1]
                break
            if c == seed_at:
                s[k] += e[k - 1]
                e[k] = s[k] / p
                live = k + 1
                if k + 1 < levels:
                    s[k + 1] = e[k]
                break
            e[k] = a * (e[k - 1] - e[k]) + e[k]
        rows.append(tuple(e[:live]))
    return rows


def ref_dema(v: list[float], p: int) -> list[float | None]:
    n = len(v)
    if p == 0 or n < 2 * p - 1:
        return [None] * n
    rows = _chain_ema_fold(v, p, 2)
    out: list[float | None] = []
    for i, r in enumerate(rows):
        c = i + 1
        # the reference appends NULL on the seed row (count == 2p-1) and
        # emits only from count >= 2p — one row later than TEMA/T3
        if r is None or len(r) < 2 or c == 2 * p - 1:
            out.append(None)
        else:
            out.append(2.0 * r[0] - r[1])
    return out


def ref_tema(v: list[float], p: int) -> list[float | None]:
    n = len(v)
    if p == 0 or n < 3 * p - 2:
        return [None] * n
    rows = _chain_ema_fold(v, p, 3)
    return [
        None if r is None or len(r) < 3 else 3.0 * r[0] - 3.0 * r[1] + r[2]
        for r in rows
    ]


def ref_t3(v: list[float], p: int, vf: float) -> list[float | None]:
    n = len(v)
    if p == 0 or n < 6 * p - 5:
        return [None] * n
    c1 = -(vf**3)
    c2 = 3.0 * vf**2 - 3.0 * c1
    c3 = -2.0 * c2 - 3.0 * c1 - 3.0 * vf
    c4 = 1.0 - c1 - c2 - c3
    rows = _chain_ema_fold(v, p, 6)
    return [
        None
        if r is None or len(r) < 6
        else c1 * r[5] + c2 * r[4] + c3 * r[3] + c4 * r[2]
        for r in rows
    ]


def ref_trima(v: list[float], p: int) -> list[float | None]:
    if p % 2 == 1:
        n1 = n2 = p // 2 + 1
    else:
        n1, n2 = p // 2, p // 2 + 1
    inner = ref_sma(v, n1)
    dense = [x for x in inner if x is not None]
    outer = ref_sma(dense, n2)
    out: list[float | None] = []
    j = 0
    for x in inner:
        if x is None:
            out.append(None)
        else:
            out.append(outer[j])
            j += 1
    return out


def ref_kama(v: list[float], p: int) -> list[float | None]:
    """calc_kama VERBATIM: ER from a rolling window of period-change
    magnitudes (warmup |v_i − v_0|), SC = (ER·(2/3 − 2/31) + 2/31)², fold
    seeded with mean(v[p..2p−1]) and emitting from index 2p."""
    n = len(v)
    if p == 0 or n < p:
        return [None] * n
    # pass 1: ER (null for the first p rows)
    er: list[float | None] = []
    s = 0.0
    window: list[float] = []
    wsum: list[float] = []
    for i in range(n):
        if i == 0:
            window.append(v[i])
            er.append(None)
            continue
        if i < p:
            d = abs(v[i] - window[0])
            s += d
            window.append(v[i])
            wsum.append(d)
            er.append(None)
            continue
        d = abs(v[i] - window.pop(0))
        s += d - wsum.pop(0)
        window.append(v[i])
        wsum.append(d)
        er.append(d / s)
    fast, slow = 2.0 / 3.0, 2.0 / 31.0
    # pass 2: fold over sc with its own SMA warmup (counting non-null rows)
    out: list[float | None] = []
    count = 0
    ksum = 0.0
    k = 0.0
    for i in range(n):
        if er[i] is None:
            out.append(None)
            continue
        scs = er[i] * (fast - slow) + slow
        sc = scs * scs
        count += 1
        if count < p:
            ksum += v[i]
            out.append(None)
        elif count == p:
            k = ksum / p
            out.append(k)
        else:
            k = sc * (v[i] - k) + k
            out.append(k)
    return out
