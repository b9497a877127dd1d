"""Independent reference SIFT in plain numpy — the fidelity oracle for
``bundlefusion_tpu/features/sift.py`` (SURVEY.md §7 hard part 4: "compare
keys/descriptors against an independent SIFT"; no OpenCV on this machine, so
the oracle is a direct, slow transcription of Lowe 2004 — per-key Python
loops, no JAX, no shared code with the production implementation).

Implements: incremental Gaussian pyramid, DoG 26-neighbor extrema, 3D
quadratic subpixel refinement with contrast + Hessian edge rejection,
36-bin smoothed orientation histogram with peak interpolation, and the
4x4x8 trilinearly-binned gradient descriptor (Gaussian-weighted window,
L2 -> clamp 0.2 -> L2).
"""

from __future__ import annotations

import math

import numpy as np


def _gauss_blur(img: np.ndarray, sigma: float) -> np.ndarray:
    if sigma <= 0:
        return img.copy()
    r = max(1, int(math.ceil(3.0 * sigma)))
    x = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    k /= k.sum()
    pad = np.pad(img.astype(np.float64), ((r, r), (0, 0)), mode="edge")
    out = np.zeros_like(img, dtype=np.float64)
    for i, kv in enumerate(k):
        out += kv * pad[i : i + img.shape[0]]
    pad = np.pad(out, ((0, 0), (r, r)), mode="edge")
    out2 = np.zeros_like(out)
    for i, kv in enumerate(k):
        out2 += kv * pad[:, i : i + img.shape[1]]
    return out2


def _build_pyramid(img, sigma0, num_scales, num_octaves):
    base = _gauss_blur(img, math.sqrt(max(sigma0**2 - 0.5**2, 1e-6)))
    k = 2.0 ** (1.0 / num_scales)
    octaves = []
    for _ in range(num_octaves):
        if base.shape[0] < 16 or base.shape[1] < 16:
            break
        gauss = [base]
        sig_prev = sigma0
        for s in range(1, num_scales + 3):
            sig_total = sigma0 * (k**s)
            sig_inc = math.sqrt(max(sig_total**2 - sig_prev**2, 1e-9))
            gauss.append(_gauss_blur(gauss[-1], sig_inc))
            sig_prev = sig_total
        octaves.append(np.stack(gauss))
        base = gauss[num_scales][::2, ::2]
    return octaves


def detect_and_describe_ref(
    img: np.ndarray,
    sigma0: float = 1.6,
    num_scales: int = 3,
    num_octaves: int = 3,
    contrast_thresh: float = 0.006,
    edge_thresh: float = 10.0,
    max_keys: int = 512,
):
    """Returns dict of arrays: xy [K,2] (base-image px), sigma [K],
    orientation [K], response [K], desc [K,128]."""
    octaves = _build_pyramid(img, sigma0, num_scales, num_octaves)
    keys = []
    for o, gauss in enumerate(octaves):
        dog = gauss[1:] - gauss[:-1]  # [S+2, h, w]
        h, w = dog.shape[1:]
        scale = 2.0**o
        gx = np.zeros_like(gauss)
        gy = np.zeros_like(gauss)
        gx[:, :, 1:-1] = 0.5 * (gauss[:, :, 2:] - gauss[:, :, :-2])
        gy[:, 1:-1, :] = 0.5 * (gauss[:, 2:, :] - gauss[:, :-2, :])
        mag = np.sqrt(gx**2 + gy**2)
        ang = np.arctan2(gy, gx)
        for s in range(1, dog.shape[0] - 1):
            d = dog[s]
            for y in range(5, h - 5):
                for x in range(5, w - 5):
                    v = d[y, x]
                    if abs(v) < 0.8 * contrast_thresh:
                        continue
                    cube = dog[s - 1 : s + 2, y - 1 : y + 2, x - 1 : x + 2]
                    if v > 0:
                        if v < cube.max() or (cube == v).sum() > 1:
                            continue
                    else:
                        if v > cube.min() or (cube == v).sum() > 1:
                            continue
                    # 3D quadratic refinement
                    dx = 0.5 * (d[y, x + 1] - d[y, x - 1])
                    dy = 0.5 * (d[y + 1, x] - d[y - 1, x])
                    ds = 0.5 * (dog[s + 1, y, x] - dog[s - 1, y, x])
                    dxx = d[y, x + 1] + d[y, x - 1] - 2 * v
                    dyy = d[y + 1, x] + d[y - 1, x] - 2 * v
                    dss = dog[s + 1, y, x] + dog[s - 1, y, x] - 2 * v
                    dxy = 0.25 * (
                        d[y + 1, x + 1] - d[y + 1, x - 1] - d[y - 1, x + 1] + d[y - 1, x - 1]
                    )
                    dxs = 0.25 * (
                        dog[s + 1, y, x + 1] - dog[s + 1, y, x - 1]
                        - dog[s - 1, y, x + 1] + dog[s - 1, y, x - 1]
                    )
                    dys = 0.25 * (
                        dog[s + 1, y + 1, x] - dog[s + 1, y - 1, x]
                        - dog[s - 1, y + 1, x] + dog[s - 1, y - 1, x]
                    )
                    H = np.array([[dxx, dxy, dxs], [dxy, dyy, dys], [dxs, dys, dss]])
                    g = np.array([dx, dy, ds])
                    try:
                        off = -np.linalg.solve(H, g)
                    except np.linalg.LinAlgError:
                        continue
                    if np.abs(off).max() > 1.5:
                        continue
                    refined = v + 0.5 * g @ off
                    if abs(refined) < contrast_thresh:
                        continue
                    # edge rejection on the 2x2 spatial Hessian
                    tr, det = dxx + dyy, dxx * dyy - dxy * dxy
                    if det <= 0 or tr * tr / det >= (edge_thresh + 1) ** 2 / edge_thresh:
                        continue
                    kx, ky = x + off[0], y + off[1]
                    ks = s + off[2]
                    sig_oct = sigma0 * (2.0 ** (ks / num_scales))
                    # orientation: 36-bin histogram in a 3*sigma window at
                    # gaussian level s
                    hist = np.zeros(36)
                    rad = int(round(4.5 * sig_oct))
                    wsig = 1.5 * sig_oct
                    for yy in range(max(1, y - rad), min(h - 1, y + rad + 1)):
                        for xx in range(max(1, x - rad), min(w - 1, x + rad + 1)):
                            dd = (yy - ky) ** 2 + (xx - kx) ** 2
                            if dd > rad * rad:
                                continue
                            wgt = math.exp(-dd / (2 * wsig * wsig)) * mag[s, yy, xx]
                            b = int(np.floor((ang[s, yy, xx] + math.pi) / (2 * math.pi) * 36)) % 36
                            hist[b] += wgt
                    for _ in range(2):  # smooth
                        hist = (np.roll(hist, 1) + hist + np.roll(hist, -1)) / 3.0
                    pk = int(np.argmax(hist))
                    if hist[pk] <= 0:
                        continue
                    l, r_ = hist[(pk - 1) % 36], hist[(pk + 1) % 36]
                    denom = hist[pk] * 2 - l - r_
                    dpk = 0.5 * (l - r_) / denom if abs(denom) > 1e-12 else 0.0
                    theta = ((pk + 0.5 + dpk) / 36.0) * 2 * math.pi - math.pi
                    keys.append(
                        dict(
                            x=kx * scale, y=ky * scale, sigma=sig_oct * scale,
                            theta=theta, resp=abs(refined),
                            o=o, s=s, kx=kx, ky=ky, sig_oct=sig_oct,
                        )
                    )
    keys.sort(key=lambda kk: -kk["resp"])
    keys = keys[:max_keys]

    # descriptors
    descs = []
    for kk in keys:
        o, s = kk["o"], kk["s"]
        gauss = octaves[o]
        h, w = gauss.shape[1:]
        gx = np.zeros((h, w))
        gy = np.zeros((h, w))
        gx[:, 1:-1] = 0.5 * (gauss[s, :, 2:] - gauss[s, :, :-2])
        gy[1:-1, :] = 0.5 * (gauss[s, 2:, :] - gauss[s, :-2, :])
        mag = np.sqrt(gx**2 + gy**2)
        ang = np.arctan2(gy, gx)
        ct, st = math.cos(kk["theta"]), math.sin(kk["theta"])
        hist_w = 3.0 * kk["sig_oct"]  # descriptor bin width in pixels
        rad = int(round(hist_w * math.sqrt(2) * 2.5))
        desc = np.zeros((4, 4, 8))
        for yy in range(max(0, int(kk["ky"]) - rad), min(h, int(kk["ky"]) + rad + 1)):
            for xx in range(max(0, int(kk["kx"]) - rad), min(w, int(kk["kx"]) + rad + 1)):
                du, dv = xx - kk["kx"], yy - kk["ky"]
                # rotate into keypoint frame, in units of bin width
                u = (ct * du + st * dv) / hist_w
                v = (-st * du + ct * dv) / hist_w
                bu, bv = u + 1.5, v + 1.5  # bin coords in [−0.5, 3.5]
                if bu <= -1 or bu >= 4 or bv <= -1 or bv >= 4:
                    continue
                # Gaussian window sigma = 1 bin width (the production kernel's
                # documented window, sift.py::_spatial_weights — tighter than
                # Lowe's 2-bin sigma; a deliberate parameter, matched here so
                # cosine comparisons measure math fidelity, not window choice)
                wgt = math.exp(-(u * u + v * v) / 2.0) * mag[yy, xx]
                # orientation bin origin at relative angle 0 (production
                # convention: binf = (ang - theta)/2pi * 8, no +pi shift)
                th = ang[yy, xx] - kk["theta"]
                bo = (th / (2 * math.pi) * 8) % 8
                u0, v0, o0 = int(np.floor(bu)), int(np.floor(bv)), int(np.floor(bo))
                fu, fv, fo = bu - u0, bv - v0, bo - o0
                for iu in (0, 1):
                    for iv in (0, 1):
                        for io in (0, 1):
                            uu, vv = u0 + iu, v0 + iv
                            if not (0 <= uu < 4 and 0 <= vv < 4):
                                continue
                            wq = (
                                wgt
                                * (fu if iu else 1 - fu)
                                * (fv if iv else 1 - fv)
                                * (fo if io else 1 - fo)
                            )
                            desc[vv, uu, (o0 + io) % 8] += wq
        d = desc.reshape(-1)
        n = np.linalg.norm(d)
        if n > 1e-12:
            d = np.minimum(d / n, 0.2)
            d = d / max(np.linalg.norm(d), 1e-12)
        descs.append(d)

    return dict(
        xy=np.array([[kk["x"], kk["y"]] for kk in keys]).reshape(-1, 2),
        sigma=np.array([kk["sigma"] for kk in keys]),
        orientation=np.array([kk["theta"] for kk in keys]),
        response=np.array([kk["resp"] for kk in keys]),
        desc=np.stack(descs) if descs else np.zeros((0, 128)),
    )
