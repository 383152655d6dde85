"""MESA / Hilbert-transform indicator family — one numpy state machine, six
output modes + MAMA (SURVEY.md §2.5 Cycle; /root/reference/src/talib/cycle.rs).

The reference implements six kernels sharing one state machine
(cycle.rs:27-64 is the canonical copy): a 4-bar WMA smoother
(calc_smooth, cycle.rs:462-470), the Hilbert FIR (±0.0962/±0.5769) with
adj = 0.075·period + 0.54, I/Q mixing, period clamped to
[0.67·prev, 1.5·prev] ∩ [6, 50], and 0.2-EMA smoothing. All outputs are null
for the first 31 rows (cycle.rs:66-68) and the whole series is null when
n < 32 (cycle.rs:16-18). MAMA (overlap.rs:156-177 entry; helper missing from
the snapshot) shares the pipeline with a phase-rate-of-change adaptive alpha;
the algorithm is preserved in the dead-code python/polars_quant/cycle.py:32-91.

Spark-side: inherently sequential per symbol → these kernels run inside the
recurrence runner's single applyInPandas pass (KERNELS registry below extends
operators.recurrence.KERNELS on import).
"""

from __future__ import annotations

import numpy as np

from polars_quant_spark.operators import recurrence as _rec

WARMUP = 32


def _hilbert_fir(x: np.ndarray, i: int, adj: float) -> float:
    """0.0962·x[i] + 0.5769·x[i−2] − 0.5769·x[i−4] − 0.0962·x[i−6], scaled."""
    return (
        0.0962 * x[i] + 0.5769 * x[i - 2] - 0.5769 * x[i - 4] - 0.0962 * x[i - 6]
    ) * adj


def _mesa_state(v: np.ndarray) -> dict[str, np.ndarray]:
    """Run the shared MESA state machine over a dense price array.

    Returns per-bar arrays: period (smoothed dominant cycle), smooth (4-bar
    WMA), detrender, i1, q1, i2, q2, re, im, smooth_period, phase.
    """
    n = v.shape[0]
    smooth = np.zeros(n)
    det = np.zeros(n)
    i1 = np.zeros(n)
    q1 = np.zeros(n)
    i2 = np.zeros(n)
    q2 = np.zeros(n)
    re = np.zeros(n)
    im = np.zeros(n)
    period = np.full(n, 6.0)
    speriod = np.zeros(n)
    phase = np.zeros(n)

    for i in range(n):
        if i >= 3:
            smooth[i] = (4.0 * v[i] + 3.0 * v[i - 1] + 2.0 * v[i - 2] + v[i - 3]) / 10.0
        else:
            smooth[i] = v[i]
        if i < 6:
            continue
        adj = 0.075 * period[i - 1] + 0.54
        det[i] = _hilbert_fir(smooth, i, adj)
        if i < 9:
            continue
        # quadrature (FIR over detrender) and in-phase (detrender delayed 3)
        q1[i] = _hilbert_fir(det, i, adj)
        i1[i] = det[i - 3]
        # advance phase by 90°
        ji = _hilbert_fir(i1, i, adj)
        jq = _hilbert_fir(q1, i, adj)
        i2[i] = i1[i] - jq
        q2[i] = q1[i] + ji
        # smooth the I/Q components
        i2[i] = 0.2 * i2[i] + 0.8 * i2[i - 1]
        q2[i] = 0.2 * q2[i] + 0.8 * q2[i - 1]
        # homodyne discriminator
        re_raw = i2[i] * i2[i - 1] + q2[i] * q2[i - 1]
        im_raw = i2[i] * q2[i - 1] - q2[i] * i2[i - 1]
        re[i] = 0.2 * re_raw + 0.8 * re[i - 1]
        im[i] = 0.2 * im_raw + 0.8 * im[i - 1]
        p = period[i - 1]
        if im[i] != 0.0 and re[i] != 0.0:
            p = 2.0 * np.pi / np.arctan2(im[i], re[i]) if np.arctan2(im[i], re[i]) != 0 else p
        # clamp to [0.67·prev, 1.5·prev] ∩ [6, 50] (cycle.rs:50-56)
        p = min(p, 1.5 * period[i - 1])
        p = max(p, 0.67 * period[i - 1])
        p = min(max(p, 6.0), 50.0)
        period[i] = 0.2 * p + 0.8 * period[i - 1]
        speriod[i] = 0.33 * period[i] + 0.67 * speriod[i - 1]
        # dominant cycle phase from I1/Q1 (cycle.rs HT_DCPHASE shape)
        if i1[i] != 0.0:
            phase[i] = np.degrees(np.arctan(q1[i] / i1[i]))
        phase[i] += 90.0
        if i1[i] < 0.0:
            phase[i] += 180.0
        if phase[i] > 315.0:
            phase[i] -= 360.0

    return {
        "period": period,
        "speriod": speriod,
        "phase": phase,
        "i1": i1,
        "q1": q1,
        "smooth": smooth,
    }


def _warm_mask(n: int) -> np.ndarray:
    out = np.zeros(n, dtype=bool)
    out[:WARMUP] = True
    return out


def _with_state(fn):
    def kernel(x: np.ndarray, **params) -> np.ndarray:
        def dense(v: np.ndarray) -> np.ndarray:
            n = v.shape[0]
            if n < WARMUP:
                return np.full(n, np.nan)
            st = _mesa_state(v)
            out = fn(v, st, **params)
            out[_warm_mask(n)] = np.nan
            return out

        return _rec._compact_apply(dense, x)

    return kernel


@_with_state
def ht_dcperiod(v, st):
    """Dominant cycle period (cycle.rs:9-72)."""
    return st["speriod"].copy()


@_with_state
def ht_dcphase(v, st):
    """Dominant cycle phase (cycle.rs:74-147)."""
    return st["phase"].copy()


def ht_phasor(x: np.ndarray):
    """(inphase, quadrature) pair (cycle.rs:158-227)."""

    def dense(v):
        n = v.shape[0]
        if n < WARMUP:
            return np.full(n, np.nan), np.full(n, np.nan)
        st = _mesa_state(v)
        i1, q1 = st["i1"].copy(), st["q1"].copy()
        m = _warm_mask(n)
        i1[m] = np.nan
        q1[m] = np.nan
        return i1, q1

    mask = ~np.isnan(x)
    i_out = np.full(x.shape[0], np.nan)
    q_out = np.full(x.shape[0], np.nan)
    if mask.sum():
        i_v, q_v = dense(x[mask])
        i_out[mask] = i_v
        q_out[mask] = q_v
    return i_out, q_out


def ht_sine(x: np.ndarray):
    """(sine, leadsine) = sin(phase), sin(phase+45°) (cycle.rs:235-307)."""

    def dense(v):
        n = v.shape[0]
        if n < WARMUP:
            return np.full(n, np.nan), np.full(n, np.nan)
        st = _mesa_state(v)
        ph = np.radians(st["phase"])
        s = np.sin(ph)
        lead = np.sin(ph + np.pi / 4.0)
        m = _warm_mask(n)
        s[m] = np.nan
        lead[m] = np.nan
        return s, lead

    mask = ~np.isnan(x)
    s_out = np.full(x.shape[0], np.nan)
    l_out = np.full(x.shape[0], np.nan)
    if mask.sum():
        s_v, l_v = dense(x[mask])
        s_out[mask] = s_v
        l_out[mask] = l_v
    return s_out, l_out


@_with_state
def ht_trendline(v, st):
    """Instantaneous trendline: average of price over the dominant cycle
    period, 4-bar smoothed (cycle.rs:309-374)."""
    n = v.shape[0]
    itrend = np.zeros(n)
    out = np.zeros(n)
    dcp = st["speriod"]
    for i in range(n):
        p = int(dcp[i] + 0.5)
        if p < 1:
            p = 1
        lo = max(0, i - p + 1)
        itrend[i] = v[lo : i + 1].sum() / (i + 1 - lo)
        if i >= 3:
            out[i] = (4.0 * itrend[i] + 3.0 * itrend[i - 1] + 2.0 * itrend[i - 2] + itrend[i - 3]) / 10.0
        else:
            out[i] = itrend[i]
    return out


@_with_state
def ht_trendmode(v, st):
    """1 when |price − trendline| > 1%·trendline else 0 (cycle.rs:376-448)."""
    n = v.shape[0]
    itrend = np.zeros(n)
    tl = np.zeros(n)
    dcp = st["speriod"]
    for i in range(n):
        p = int(dcp[i] + 0.5)
        if p < 1:
            p = 1
        lo = max(0, i - p + 1)
        itrend[i] = v[lo : i + 1].sum() / (i + 1 - lo)
        if i >= 3:
            tl[i] = (4.0 * itrend[i] + 3.0 * itrend[i - 1] + 2.0 * itrend[i - 2] + itrend[i - 3]) / 10.0
        else:
            tl[i] = itrend[i]
    with np.errstate(invalid="ignore", divide="ignore"):
        mode = np.where(np.abs(v - tl) > 0.01 * np.abs(tl), 1.0, 0.0)
    return mode


def mama(x: np.ndarray, fastlimit: float = 0.5, slowlimit: float = 0.05):
    """MESA adaptive MA pair (mama, fama) — overlap.rs:156-177 entry, helper
    missing; algorithm from the dead-code cycle.py:32-91 / Ehlers: alpha =
    clamp(fast/ (phase rate of change), slow, fast)."""

    def dense(v):
        n = v.shape[0]
        if n < WARMUP:
            return np.full(n, np.nan), np.full(n, np.nan)
        st = _mesa_state(v)
        phase = st["phase"]
        m_out = np.zeros(n)
        f_out = np.zeros(n)
        m_out[0] = v[0]
        f_out[0] = v[0]
        for i in range(1, n):
            delta = phase[i - 1] - phase[i]
            if delta < 1.0:
                delta = 1.0
            alpha = fastlimit / delta
            if alpha < slowlimit:
                alpha = slowlimit
            if alpha > fastlimit:
                alpha = fastlimit
            m_out[i] = alpha * v[i] + (1.0 - alpha) * m_out[i - 1]
            f_out[i] = 0.5 * alpha * m_out[i] + (1.0 - 0.5 * alpha) * f_out[i - 1]
        m = _warm_mask(n)
        m_out[m] = np.nan
        f_out[m] = np.nan
        return m_out, f_out

    mask = ~np.isnan(x)
    m_res = np.full(x.shape[0], np.nan)
    f_res = np.full(x.shape[0], np.nan)
    if mask.sum():
        m_v, f_v = dense(x[mask])
        m_res[mask] = m_v
        f_res[mask] = f_v
    return m_res, f_res


def mavp(x: np.ndarray, periods: np.ndarray, minperiod: int = 2, maxperiod: int = 30):
    """Variable-period SMA: per-row window length from `periods`, clamped to
    [minperiod, maxperiod] (overlap.rs:407-434 entry; helper missing —
    matype=0/SMA semantics)."""

    def dense(v: np.ndarray, per: np.ndarray) -> np.ndarray:
        n = v.shape[0]
        out = np.full(n, np.nan)
        for i in range(n):
            p = int(per[i])
            p = max(minperiod, min(maxperiod, p))
            if i + 1 >= p:
                out[i] = float(np.cumsum(v[i - p + 1 : i + 1])[-1]) / p
        return out

    return _rec._compact_apply(dense, x, periods)


# register into the shared kernel table
_rec.KERNELS.update(
    {
        "ht_dcperiod": (ht_dcperiod, 1),
        "ht_dcphase": (ht_dcphase, 1),
        "ht_phasor": (ht_phasor, 1),
        "ht_sine": (ht_sine, 1),
        "ht_trendline": (ht_trendline, 1),
        "ht_trendmode": (ht_trendmode, 1),
        "mama": (mama, 1),
        "mavp": (mavp, 2),
    }
)
