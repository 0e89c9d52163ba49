"""PESQ calibration battery: score the first-party P.862-style implementation
(ops/pesq.py) across degradation families — level shifts, band-limiting,
clipping, echo, additive noise — and print a markdown table.

The reference stack obtains PESQ from the ITU `pesq` C extension via asteroid
(reference src/inferencers/inferencer.py:64-70). That binary is absent from
this image, so the battery pins the implementation to *published P.862
behavior*: the ANCHORS column gives the expected MOS-LQO window from the
P.862 literature / the `pesq` package's behavior on the same degradation, and
DELTA-MAX is the worst-case distance from the window. The resulting error
envelope is recorded in PARITY.md.

    python scripts/perf/pesq_battery.py [--fs 8000]
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")

from tss_dprnn_tpu.ops.pesq import pesq


def speech_like(fs: int, seconds: float = 6.0, seed: int = 0) -> np.ndarray:
    """Pseudo-speech with a realistic broadband spectrum: voiced harmonic
    stacks up to ~3.5 kHz with a -6 dB/oct rolloff, plus fricative-like
    band-limited noise bursts. A band-limit battery is meaningless on
    material with no high-band energy (a pure low-harmonic signal scores LP
    degradations as transparent — they are, for that signal)."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * fs)) / fs
    env = (np.sin(2 * np.pi * 1.3 * t) ** 2) * (np.sin(2 * np.pi * 0.31 * t) > -0.3)
    f0 = 170.0
    voiced = env * sum(
        np.sin(2 * np.pi * k * f0 * t + rng.uniform(0, 6)) / k
        for k in range(1, int(3500 / f0) + 1)
    )
    # fricative bursts: 1.5-3.8 kHz noise gated by a different syllabic phase
    noise = rng.standard_normal(len(t))
    X = np.fft.rfft(noise)
    f = np.fft.rfftfreq(len(t), 1 / fs)
    fric = np.fft.irfft(X * ((f > 1500) & (f < 3800)), n=len(t))
    fric *= (np.sin(2 * np.pi * 0.9 * t + 2.0) > 0.55).astype(float)
    x = voiced + 0.35 * fric / (np.abs(fric).max() + 1e-9) * np.abs(voiced).max()
    return (x / np.abs(x).max() * 0.5).astype(np.float64)


def with_snr(x, snr_db, seed=1):
    n = np.random.default_rng(seed).normal(size=len(x))
    n *= np.sqrt(np.mean(x**2)) / np.sqrt(np.mean(n**2)) * 10 ** (-snr_db / 20)
    return x + n


def lowpass(x, fs, cutoff):
    X = np.fft.rfft(x)
    f = np.fft.rfftfreq(len(x), 1 / fs)
    return np.fft.irfft(X * (f <= cutoff), n=len(x))


def clip(x, frac):
    """Hard-clip at ``frac`` of the peak amplitude."""
    th = frac * np.abs(x).max()
    return np.clip(x, -th, th)


def echo(x, fs, delay_ms, gain):
    d = int(fs * delay_ms / 1000)
    y = x.copy()
    y[d:] += gain * x[:-d]
    return y


def mu_law_bits(x, bits):
    """mu-law companding at reduced bit depth (codec-style degradation)."""
    mu = 2.0**bits - 1
    peak = np.abs(x).max()
    xn = x / peak
    comp = np.sign(xn) * np.log1p(mu * np.abs(xn)) / np.log1p(mu)
    q = np.round(comp * mu) / mu
    return np.sign(q) * (np.power(1 + mu, np.abs(q)) - 1) / mu * peak


# (family, label, degradation fn, expected MOS-LQO window from published
# P.862 behavior on comparable material)
def battery(fs):
    ref = speech_like(fs)
    return [
        # level handling: P.862 level-aligns, so pure gain is near-transparent
        ("level", "+10 dB gain", ref * 10 ** (10 / 20), (4.0, 4.56)),
        ("level", "-10 dB gain", ref * 10 ** (-10 / 20), (4.0, 4.56)),
        ("level", "-20 dB gain", ref * 10 ** (-20 / 20), (4.0, 4.56)),
        # additive noise: the published SNR curve (~4.0/3.4/2.6/2.0)
        ("noise", "SNR 35 dB", with_snr(ref, 35), (3.6, 4.5)),
        ("noise", "SNR 25 dB", with_snr(ref, 25), (3.0, 3.9)),
        ("noise", "SNR 15 dB", with_snr(ref, 15), (2.2, 3.1)),
        ("noise", "SNR 5 dB", with_snr(ref, 5), (1.4, 2.4)),
        # band-limiting: telephone band 3.4k is mild; 1 kHz is severe
        ("bandlimit", "LP 3.4 kHz", lowpass(ref, fs, 3400), (3.3, 4.56)),
        ("bandlimit", "LP 2 kHz", lowpass(ref, fs, 2000), (2.4, 4.3)),
        ("bandlimit", "LP 1 kHz", lowpass(ref, fs, 1000), (1.6, 3.6)),
        # clipping
        ("clip", "clip 50%", clip(ref, 0.5), (2.8, 4.4)),
        ("clip", "clip 25%", clip(ref, 0.25), (2.2, 4.0)),
        ("clip", "clip 10%", clip(ref, 0.10), (1.4, 3.2)),
        # echo (unremoved reflection)
        ("echo", "echo 25 ms -10 dB", echo(ref, fs, 25, 10 ** (-10 / 20)), (2.5, 4.3)),
        ("echo", "echo 100 ms -10 dB", echo(ref, fs, 100, 10 ** (-10 / 20)), (2.0, 4.0)),
        ("echo", "echo 100 ms -3 dB", echo(ref, fs, 100, 10 ** (-3 / 20)), (1.2, 3.2)),
        # codec-ish: mu-law companding
        ("codec", "mu-law 8 bit", mu_law_bits(ref, 8), (3.5, 4.56)),
        ("codec", "mu-law 4 bit", mu_law_bits(ref, 4), (1.8, 3.6)),
    ]


def sparse_voiced(fs: int, seconds: float = 6.0, seed: int = 0) -> np.ndarray:
    """Voiced-only harmonic material with DEEP spectral valleys — the
    spectral sparsity regime of real speech vowels. Nonlinear distortion
    products (clipping harmonics, companding noise) land in the valleys
    here, where P.862's asymmetry gate and 0.25*min masking actually see
    them — on the broadband ``speech_like`` material they are spectrally
    coincident with reference energy and (faithfully, per spec) masked.
    See PARITY.md 'clip/mu-law leniency root cause' (round 4)."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * fs)) / fs
    env = (np.sin(2 * np.pi * 1.1 * t) ** 2) * (np.sin(2 * np.pi * 0.27 * t) > -0.4)
    f0 = 140.0
    x = env * sum(np.sin(2 * np.pi * k * f0 * t + rng.uniform(0, 6)) / k
                  for k in range(1, 9))
    return (x / np.abs(x).max() * 0.5).astype(np.float64)


def nonlinear_battery(fs):
    """Clipping/companding on sparse voiced material: published-window pins
    for the nonlinear families (the broadband battery's clip rows are
    material-lenient, not implementation-lenient — measured round 4)."""
    ref = sparse_voiced(fs)
    return [
        ("clip", "sparse clip 50%", clip(ref, 0.5), (2.3, 4.2)),
        ("clip", "sparse clip 25%", clip(ref, 0.25), (1.9, 3.6)),
        ("clip", "sparse clip 10%", clip(ref, 0.10), (1.4, 3.2)),
        ("codec", "sparse mu-law 4 bit", mu_law_bits(ref, 4), (1.8, 3.6)),
    ]


# ---------------------------------------------------------------- hold-out
# Families NOT used to select _FREQ_COMP_OFFSET (round-2 VERDICT weak #4):
# the re-scale was fitted on the band-limit/noise anchors above; these check
# it generalizes. Material uses a held-out generator seed as well.


def reverb(x, fs, rt60, drr_db=0.0, seed=3):
    """Synthetic RIR: unit direct path + exponentially-decaying noise tail
    normalized to ``drr_db`` direct-to-reverberant ratio."""
    rng = np.random.default_rng(seed)
    n = int(rt60 * fs)
    t = np.arange(n) / fs
    tail = rng.standard_normal(n) * np.exp(-3.0 * np.log(10) * t / rt60)
    tail[0] = 0.0
    tail *= 10 ** (-drr_db / 20) / (np.sqrt(np.sum(tail ** 2)) + 1e-12)
    h = np.zeros(n)
    h[0] = 1.0
    h += tail
    return np.convolve(x, h)[: len(x)]


def nb_noise(x, fs, snr_db, lo=1000, hi=2000, seed=5):
    """Narrowband (1-2 kHz) noise at ``snr_db`` — exercises the band
    compensation asymmetrically (energy ADDED to a band subset)."""
    rng = np.random.default_rng(seed)
    n = rng.standard_normal(len(x))
    X = np.fft.rfft(n)
    f = np.fft.rfftfreq(len(x), 1 / fs)
    n = np.fft.irfft(X * ((f >= lo) & (f <= hi)), n=len(x))
    n *= np.sqrt(np.mean(x ** 2)) / np.sqrt(np.mean(n ** 2)) * 10 ** (-snr_db / 20)
    return x + n


def babble(x, fs, snr_db, seed=6):
    """Speech-shaped, syllabically-modulated noise (babble-like)."""
    rng = np.random.default_rng(seed)
    n = rng.standard_normal(len(x))
    X = np.fft.rfft(n)
    f = np.fft.rfftfreq(len(x), 1 / fs)
    shape = 1.0 / np.maximum(f, 120.0)
    n = np.fft.irfft(X * shape * (f < 3800), n=len(x))
    t = np.arange(len(x)) / fs
    n *= 0.6 + 0.4 * np.sin(2 * np.pi * 3.1 * t + 1.0) * np.sin(2 * np.pi * 0.7 * t)
    n *= np.sqrt(np.mean(x ** 2)) / np.sqrt(np.mean(n ** 2)) * 10 ** (-snr_db / 20)
    return x + n


def am(x, fs, depth, rate=4.0):
    """Slow amplitude modulation. NB: P.862's short-term gain compensation is
    *designed* to partially compensate time-varying gain (P.862 §10.2.3), so
    moderate slow AM is near-transparent by spec."""
    t = np.arange(len(x)) / fs
    return x * (1.0 - depth * 0.5 * (1 + np.sin(2 * np.pi * rate * t)))


def highpass(x, fs, cutoff):
    X = np.fft.rfft(x)
    f = np.fft.rfftfreq(len(x), 1 / fs)
    return np.fft.irfft(X * (f >= cutoff), n=len(x))


def holdout_battery(fs):
    ref = speech_like(fs, seed=7)  # held-out material
    return ref, [
        ("reverb", "RT60 0.15 s", reverb(ref, fs, 0.15), (3.0, 4.5)),
        ("reverb", "RT60 0.4 s", reverb(ref, fs, 0.4), (2.3, 3.9)),
        ("reverb", "RT60 0.8 s", reverb(ref, fs, 0.8), (1.8, 3.3)),
        ("nbnoise", "1-2 kHz SNR 25", nb_noise(ref, fs, 25), (2.9, 4.2)),
        ("nbnoise", "1-2 kHz SNR 15", nb_noise(ref, fs, 15), (2.1, 3.4)),
        ("babble", "SNR 20", babble(ref, fs, 20), (2.6, 3.9)),
        ("babble", "SNR 10", babble(ref, fs, 10), (1.7, 3.0)),
        ("am", "4 Hz depth 0.5", am(ref, fs, 0.5), (3.0, 4.56)),
        ("am", "4 Hz depth 0.9", am(ref, fs, 0.9), (1.8, 3.6)),
        ("highpass", "HP 300 Hz", highpass(ref, fs, 300), (3.4, 4.56)),
    ]


def main():
    fs = int(sys.argv[sys.argv.index("--fs") + 1]) if "--fs" in sys.argv else 8000
    mode = "wb" if fs == 16000 else "nb"
    holdout = "--holdout" in sys.argv
    nonlinear = "--nonlinear" in sys.argv
    if holdout:
        ref, cases = holdout_battery(fs)
    elif nonlinear:
        ref = sparse_voiced(fs)
        cases = nonlinear_battery(fs)
    else:
        ref = speech_like(fs)
        cases = battery(fs)
    rows = []
    worst = 0.0
    print(f"| family | degradation | MOS-LQO ({mode}) | expected window | in window |")
    print("|---|---|---|---|---|")
    for fam, label, deg, (lo, hi) in cases:
        m = pesq(fs, ref, deg, mode=mode)
        inwin = lo <= m <= hi
        if not inwin:
            worst = max(worst, lo - m if m < lo else m - hi)
        rows.append((fam, label, m, lo, hi, inwin))
        print(f"| {fam} | {label} | {m:.2f} | [{lo:.1f}, {hi:.1f}] | {'yes' if inwin else 'NO'} |")
    # monotonicity within each ordered family
    print()
    fams = (("reverb", "nbnoise", "babble", "am") if holdout else
            ("clip",) if nonlinear else
            ("noise", "bandlimit", "clip", "codec"))
    for fam in fams:
        vals = [r[2] for r in rows if r[0] == fam]
        mono = all(a >= b - 1e-9 for a, b in zip(vals, vals[1:]))
        print(f"monotone {fam}: {'yes' if mono else 'NO'} {['%.2f' % v for v in vals]}")
    n_out = sum(1 for r in rows if not r[5])
    print(f"\nout-of-window: {n_out}/{len(rows)}; worst excursion {worst:.2f} MOS")


if __name__ == "__main__":
    main()
