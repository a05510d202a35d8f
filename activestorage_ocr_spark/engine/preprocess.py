"""Image preprocessing chain — numpy reimplementation of the reference's
7-step pipeline with its 4 presets (SURVEY.md §2.3, T1-T8;
`rust/src/preprocessing/`).

Ordering and preset gating are reproduced exactly (T1,
`rust/src/preprocessing/pipeline.rs:80-152`):

* ``none``       -> identity, 0 steps
* ``minimal``    -> grayscale
* ``default``    -> grayscale, resize, normalize, sharpen
* ``aggressive`` -> grayscale, resize, denoise, normalize, sharpen, deskew,
                    threshold

Each step is timed into a (name, time_ms) list, mirroring ``StepTiming``
(`rust/src/preprocessing/pipeline.rs:49-67`). All steps are pure ndarray ->
ndarray functions (uint8 grayscale after the grayscale step).

Note on the hot path: the deterministic OCR stand-in does not *need*
preprocessing to decode our synthetic rasters, so the extraction job's default
preset is ``minimal`` — the chain exists for parity, is preset-selectable per
job, and is unit-tested step-by-step against the reference semantics.
"""

from __future__ import annotations

import time

import numpy as np

from . import budget
from .rasters import rgb_to_gray

PRESETS = ("none", "minimal", "default", "aggressive")

#: resize target ratio: 72 dpi -> 300 dpi (`rust/src/preprocessing/steps/resize.rs:4-48`)
RESIZE_RATIO = 300.0 / 72.0
RESIZE_MAX_DIM = 4000
RESIZE_MIN_DIM = 300
RESIZE_SKIP_LO, RESIZE_SKIP_HI = 0.95, 1.05

DESKEW_COARSE = 0.5
DESKEW_FINE = 0.1
DESKEW_RANGE = 5.0
DESKEW_SKIP = 0.1

SAUVOLA_WINDOW = 15
SAUVOLA_K = 0.2
SAUVOLA_R = 128.0


def grayscale(img: np.ndarray) -> np.ndarray:
    """T2: ITU-R 601 luma (`grayscale.rs:6-8`); identity if already 2-D."""
    if img.ndim == 2:
        return img
    return rgb_to_gray(img)


def _lanczos3_weights(length_in: int, length_out: int) -> tuple[np.ndarray, np.ndarray]:
    """Separable Lanczos3 resample weights: returns (indices, weights) with
    shape (length_out, taps)."""
    a = 3
    scale = length_in / length_out
    support = a * max(scale, 1.0)
    taps = int(np.ceil(2 * support)) + 1
    centers = (np.arange(length_out) + 0.5) * scale - 0.5
    left = np.floor(centers - support).astype(int) + 1
    idx = left[:, None] + np.arange(taps)[None, :]
    x = (idx - centers[:, None]) / max(scale, 1.0)
    w = np.sinc(x) * np.sinc(x / a)
    w[np.abs(x) >= a] = 0.0
    wsum = w.sum(axis=1, keepdims=True)
    wsum[wsum == 0] = 1.0
    w = w / wsum
    idx = np.clip(idx, 0, length_in - 1)
    return idx, w


def resize(img: np.ndarray) -> np.ndarray:
    """T3 (`resize.rs:4-48`): scale x(300/72); one proportional scale-down
    when either dim exceeds 4000, one proportional scale-up only when BOTH
    dims fall below 300 (aspect-preserving, f32 truncating casts like the
    reference); skip when both axis ratios fall in [0.95, 1.05]; Lanczos3."""
    h, w = img.shape[:2]
    scale = np.float32(RESIZE_RATIO)
    tw = int(np.float32(w) * scale)
    th = int(np.float32(h) * scale)
    if tw > RESIZE_MAX_DIM or th > RESIZE_MAX_DIM:
        down = np.float32(RESIZE_MAX_DIM) / np.float32(max(tw, th))
        tw = int(np.float32(tw) * down)
        th = int(np.float32(th) * down)
    if tw < RESIZE_MIN_DIM and th < RESIZE_MIN_DIM:
        up = np.float32(RESIZE_MIN_DIM) / np.float32(max(1, min(tw, th)))
        tw = int(np.float32(tw) * up)
        th = int(np.float32(th) * up)
    # extreme aspect ratios (banner strips) can proportionally scale the
    # short side to 0; a zero target dim crashes the resampler, so clamp to
    # 1px — the degenerate-input analog of the reference's u32 floor
    tw = max(1, tw)
    th = max(1, th)
    rh, rw = th / h, tw / w
    if RESIZE_SKIP_LO <= rh <= RESIZE_SKIP_HI and RESIZE_SKIP_LO <= rw <= RESIZE_SKIP_HI:
        return img
    f = img.astype(np.float64)
    iy, wy = _lanczos3_weights(h, th)
    ix, wx = _lanczos3_weights(w, tw)
    # rows: out[o, :] = sum_t wy[o,t] * f[iy[o,t], :]
    tmp = (f[iy] * wy[:, :, None]).sum(axis=1)
    out = (tmp[:, ix] * wx[None, :, :]).sum(axis=2)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def denoise(img: np.ndarray) -> np.ndarray:
    """T4 (`denoise.rs:7-12`): 3x3 median filter, edge-replicated borders."""
    p = np.pad(img, 1, mode="edge")
    stack = np.stack(
        [p[dy : dy + img.shape[0], dx : dx + img.shape[1]] for dy in range(3) for dx in range(3)]
    )
    return np.median(stack, axis=0).astype(np.uint8)


def normalize(img: np.ndarray) -> np.ndarray:
    """T5 (`normalize.rs:6-36`): global histogram stretch to [0, 255];
    identity when max <= min."""
    lo = int(img.min())
    hi = int(img.max())
    if hi <= lo:
        return img
    out = (img.astype(np.float64) - lo) / (hi - lo) * 255.0
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def sharpen(img: np.ndarray) -> np.ndarray:
    """T6 (`sharpen.rs:7-16`): 3x3 convolution, kernel
    [0,-1,0; -1,5,-1; 0,-1,0], saturating u8, edge-replicated borders."""
    p = np.pad(img.astype(np.int32), 1, mode="edge")
    h, w = img.shape
    out = (
        5 * p[1 : 1 + h, 1 : 1 + w]
        - p[0:h, 1 : 1 + w]
        - p[2 : 2 + h, 1 : 1 + w]
        - p[1 : 1 + h, 0:w]
        - p[1 : 1 + h, 2 : 2 + w]
    )
    return np.clip(out, 0, 255).astype(np.uint8)


def _skew_score(dark: np.ndarray, angle_deg: float) -> float:
    """Projection-profile score at an angle: variance of per-row dark-pixel
    counts with each column sheared by (x - cx) * tan(angle)."""
    h, w = dark.shape
    cx = (w - 1) / 2.0
    shift = np.round((np.arange(w) - cx) * np.tan(np.radians(angle_deg))).astype(int)
    counts = np.zeros(h + 2 * (int(np.abs(shift).max()) + 1), dtype=np.int64)
    off = int(np.abs(shift).max()) + 1
    ys, xs = np.nonzero(dark)
    np.add.at(counts, ys + shift[xs] + off, 1)
    return float(counts.var())


def _rotate_bilinear(img: np.ndarray, angle_deg: float) -> np.ndarray:
    """Bilinear rotation about the image center, white (255) background
    (`deskew.rs:7-93`)."""
    h, w = img.shape
    theta = np.radians(angle_deg)
    c, s = np.cos(theta), np.sin(theta)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    # inverse map: source = R(-theta) @ (dst - center) + center
    xs = c * (xx - cx) + s * (yy - cy) + cx
    ys = -s * (xx - cx) + c * (yy - cy) + cy
    x0 = np.floor(xs).astype(int)
    y0 = np.floor(ys).astype(int)
    fx = xs - x0
    fy = ys - y0
    out = np.full((h, w), 255.0)
    valid = (x0 >= 0) & (x0 < w - 1) & (y0 >= 0) & (y0 < h - 1)
    xv, yv = x0[valid], y0[valid]
    fxv, fyv = fx[valid], fy[valid]
    f = img.astype(np.float64)
    val = (
        f[yv, xv] * (1 - fxv) * (1 - fyv)
        + f[yv, xv + 1] * fxv * (1 - fyv)
        + f[yv + 1, xv] * (1 - fxv) * fyv
        + f[yv + 1, xv + 1] * fxv * fyv
    )
    out[valid] = val
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def estimate_skew_angle(img: np.ndarray) -> float:
    """T7 search (`deskew.rs:30-52`): coarse -5..+5 deg step 0.5, then refine
    +/-0.5 around the best at step 0.1; maximize row-count variance of dark
    (<128) pixels."""
    dark = img < 128
    if not dark.any():
        return 0.0
    best_a, best_s = 0.0, -1.0
    coarse = np.arange(-DESKEW_RANGE, DESKEW_RANGE + 1e-9, DESKEW_COARSE)
    for a in coarse:
        budget.check()  # the angle search is the engine's worst straggler
        sc = _skew_score(dark, float(a))
        if sc > best_s:
            best_a, best_s = float(a), sc
    fine = np.arange(best_a - DESKEW_COARSE, best_a + DESKEW_COARSE + 1e-9, DESKEW_FINE)
    for a in fine:
        budget.check()
        sc = _skew_score(dark, float(a))
        if sc > best_s:
            best_a, best_s = float(a), sc
    return best_a


def deskew(img: np.ndarray) -> np.ndarray:
    """T7 (`deskew.rs:7-93`): rotate by the estimated angle; skip when
    |angle| < 0.1 deg."""
    angle = estimate_skew_angle(img)
    if abs(angle) < DESKEW_SKIP:
        return img
    return _rotate_bilinear(img, -angle)


def threshold(img: np.ndarray) -> np.ndarray:
    """T8 (`threshold.rs:4-86`): Sauvola adaptive threshold, window 15, k=0.2,
    R=128; t = mean * (1 + k*(std/R - 1)); integral images for O(1) window
    stats; output 0/255."""
    h, w = img.shape
    f = img.astype(np.float64)
    pad = SAUVOLA_WINDOW // 2
    # integral images with a zero border
    ii = np.zeros((h + 1, w + 1))
    ii2 = np.zeros((h + 1, w + 1))
    ii[1:, 1:] = f.cumsum(axis=0).cumsum(axis=1)
    ii2[1:, 1:] = (f * f).cumsum(axis=0).cumsum(axis=1)
    ys = np.arange(h)
    xs = np.arange(w)
    y0 = np.clip(ys - pad, 0, h)[:, None]
    y1 = np.clip(ys + pad + 1, 0, h)[:, None]
    x0 = np.clip(xs - pad, 0, w)[None, :]
    x1 = np.clip(xs + pad + 1, 0, w)[None, :]
    area = (y1 - y0) * (x1 - x0)
    s1 = ii[y1, x1] - ii[y0, x1] - ii[y1, x0] + ii[y0, x0]
    s2 = ii2[y1, x1] - ii2[y0, x1] - ii2[y1, x0] + ii2[y0, x0]
    mean = s1 / area
    var = np.maximum(s2 / area - mean * mean, 0.0)
    t = mean * (1.0 + SAUVOLA_K * (np.sqrt(var) / SAUVOLA_R - 1.0))
    return np.where(f > t, 255, 0).astype(np.uint8)


_PRESET_STEPS: dict[str, tuple[tuple[str, object], ...]] = {
    "none": (),
    "minimal": (("grayscale", grayscale),),
    "default": (
        ("grayscale", grayscale),
        ("resize", resize),
        ("normalize", normalize),
        ("sharpen", sharpen),
    ),
    "aggressive": (
        ("grayscale", grayscale),
        ("resize", resize),
        ("denoise", denoise),
        ("normalize", normalize),
        ("sharpen", sharpen),
        ("deskew", deskew),
        ("threshold", threshold),
    ),
}


def parse_preset(name: str) -> str:
    """P5 (`pipeline.rs:27-35`, `server.rs:201-213`): validate a preset name;
    invalid -> ValueError (mapped to INVALID_REQUEST by the caller)."""
    if name not in PRESETS:
        raise ValueError(f"invalid preprocessing preset: {name!r} (expected one of {PRESETS})")
    return name


def run_pipeline(img: np.ndarray, preset: str) -> tuple[np.ndarray, list[tuple[str, int]]]:
    """T1 (`pipeline.rs:80-152`): run the preset's steps in order, timing each.

    Returns (image, [(step_name, time_ms), ...]).
    """
    steps = _PRESET_STEPS[parse_preset(preset)]
    timings: list[tuple[str, int]] = []
    for name, fn in steps:
        budget.check()  # per-stage guard (SURVEY.md §1.1 timeout mapping)
        t0 = time.perf_counter()
        img = fn(img)
        timings.append((name, int((time.perf_counter() - t0) * 1000)))
    return img, timings
