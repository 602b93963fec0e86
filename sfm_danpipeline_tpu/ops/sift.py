"""TPU-native SIFT: scale-space keypoint detection + 128-d descriptors.

Re-implements the capability of the reference's feature stage
(`StructFromMotion::getFeature`, src/Sfm.cpp:303-392, which calls OpenCV
`SIFT::detectAndCompute` with nOctaveLayers=3, contrastThreshold=0.04,
edgeThreshold=10, sigma=1.6) as a from-scratch, fixed-shape JAX program:

 - Gaussian pyramid: separable XLA convolutions (reflect padding), one
   Python-level loop over octaves (static shapes per octave).
 - DoG extrema: `lax.reduce_window` 3x3x3 max/min — a whole-image VPU op,
   no per-pixel control flow.
 - Candidate selection: `top_k` over the response volume -> fixed K
   candidates per octave with validity masks (the price of jit).
 - Subpixel refinement: 3x3x3 neighborhoods gathered per candidate, 3x3
   Newton solve, contrast + edge-ratio tests (Lowe's criteria, identical
   thresholds to the reference).
 - Orientation: 36-bin gradient histogram over a Gaussian-weighted window,
   circular smoothing, parabolic peak interpolation.
 - Descriptor: 4x4x8 trilinear-binned gradient histogram sampled on a fixed
   16x16 rotated grid, L2-normalized, 0.2-clipped, renormalized.

Design notes vs OpenCV: candidate relocation is a fixed 3-iteration masked
Newton re-walk (OpenCV walks up to 5); secondary-orientation keypoints
(peaks >= 0.8 * max) are emitted like OpenCV's, as a masked duplicate row
per candidate. Detection and description are SPLIT so only candidates that
survive per-octave budget selection pay the orientation/descriptor gathers.
"""
from __future__ import annotations

import dataclasses
import functools
import math
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sfm_danpipeline_tpu.config import FeatureConfig
from sfm_danpipeline_tpu.ops.interp import gather_cube


@dataclasses.dataclass(frozen=True)
class Keypoints:
    """Fixed-shape keypoint set for one image (or a batch, when leading dims
    are added by vmap).

    xy:          (K, 2) float32 — position in original image pixels
    sigma:       (K,)   float32 — absolute scale in original image pixels
    angle:       (K,)   float32 — dominant orientation, radians
    response:    (K,)   float32 — |DoG contrast|
    descriptors: (K, 128) float32 — L2-normalized SIFT descriptors
    valid:       (K,)   bool
    """

    xy: jnp.ndarray
    sigma: jnp.ndarray
    angle: jnp.ndarray
    response: jnp.ndarray
    descriptors: jnp.ndarray
    valid: jnp.ndarray


jax.tree_util.register_dataclass(
    Keypoints,
    data_fields=["xy", "sigma", "angle", "response", "descriptors", "valid"],
    meta_fields=[],
)


# ---------------------------------------------------------------------------
# Gaussian pyramid
# ---------------------------------------------------------------------------


def _gaussian_kernel(sigma: float) -> np.ndarray:
    radius = max(1, int(math.ceil(3.0 * sigma)))
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(img: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Separable Gaussian blur with reflect-101 padding (cv::GaussianBlur
    BORDER_DEFAULT). img: (H, W). sigma is a static Python float.

    Implemented as explicit shift-multiply-adds (slices of a padded array)
    rather than conv_general_dilated: a single-channel conv forces XLA's
    TPU conv path to pad C=1 up to full vector registers and ran ~200x off
    roofline (385 ms/image for the pyramid); the shift-add form is plain
    fusible VPU code.
    """
    if sigma <= 0:
        return img
    k = _gaussian_kernel(sigma)
    r = (len(k) - 1) // 2
    # Rows.
    x = jnp.pad(img, ((0, 0), (r, r)), mode="reflect")
    acc = jnp.zeros_like(img)
    W = img.shape[1]
    for i, w in enumerate(k):
        acc = acc + float(w) * jax.lax.slice_in_dim(x, i, i + W, axis=1)
    # Cols.
    x = jnp.pad(acc, ((r, r), (0, 0)), mode="reflect")
    H = img.shape[0]
    out = jnp.zeros_like(img)
    for i, w in enumerate(k):
        out = out + float(w) * jax.lax.slice_in_dim(x, i, i + H, axis=0)
    return out


def _upsample2(img: jnp.ndarray) -> jnp.ndarray:
    H, W = img.shape
    return jax.image.resize(img, (2 * H, 2 * W), method="bilinear")


def _downsample2(img: jnp.ndarray) -> jnp.ndarray:
    return img[::2, ::2]


def build_gaussian_octave(
    base: jnp.ndarray, config: FeatureConfig
) -> jnp.ndarray:
    """One octave of S+3 progressively blurred images. base must already be
    at blur level sigma0. Returns (S+3, H, W)."""
    S = config.n_scales_per_octave
    k = 2.0 ** (1.0 / S)
    levels = [base]
    sigma_prev = config.sigma0
    for i in range(1, S + 3):
        sigma_total = config.sigma0 * (k ** i)
        sigma_inc = math.sqrt(max(sigma_total**2 - sigma_prev**2, 1e-12))
        levels.append(gaussian_blur(levels[-1], sigma_inc))
        sigma_prev = sigma_total
    return jnp.stack(levels)


# ---------------------------------------------------------------------------
# Extrema detection + refinement (per octave)
# ---------------------------------------------------------------------------


def _extrema_response(dog: jnp.ndarray, config: FeatureConfig) -> jnp.ndarray:
    """Response volume (S, H, W): |dog| where the voxel is a 3x3x3 extremum
    above the prefilter threshold, else 0. dog: (S+2, H, W)."""
    S = config.n_scales_per_octave
    prefilter = 0.5 * config.contrast_threshold / S
    window = (3, 3, 3)
    neg_inf = jnp.asarray(-jnp.inf, dog.dtype)
    mx = jax.lax.reduce_window(
        dog, neg_inf, jax.lax.max, window, (1, 1, 1), "SAME"
    )
    mn = -jax.lax.reduce_window(
        -dog, neg_inf, jax.lax.max, window, (1, 1, 1), "SAME"
    )
    inner = dog[1 : S + 1]
    is_ext = ((inner >= mx[1 : S + 1]) & (inner > prefilter)) | (
        (inner <= mn[1 : S + 1]) & (inner < -prefilter)
    )
    return jnp.where(is_ext, jnp.abs(inner), 0.0)


def _newton_step(
    dog: jnp.ndarray,
    s: jnp.ndarray,
    y: jnp.ndarray,
    x: jnp.ndarray,
    config: FeatureConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One 3x3x3 Newton solve at integer centers (Lowe 2004 §4).

    dog: (S+2, H, W); s indexes the *inner* levels (0..S-1 -> dog level s+1).
    Returns (offset (K,3) [ds,dy,dx], contrast (K,), quality_ok (K,)).
    """
    cube = gather_cube(dog, s + 1, y, x)  # (K, 3, 3, 3) [ds, dy, dx]
    c = cube[:, 1, 1, 1]
    # First derivatives (central differences).
    gs = 0.5 * (cube[:, 2, 1, 1] - cube[:, 0, 1, 1])
    gy = 0.5 * (cube[:, 1, 2, 1] - cube[:, 1, 0, 1])
    gx = 0.5 * (cube[:, 1, 1, 2] - cube[:, 1, 1, 0])
    # Second derivatives.
    dss = cube[:, 2, 1, 1] - 2 * c + cube[:, 0, 1, 1]
    dyy = cube[:, 1, 2, 1] - 2 * c + cube[:, 1, 0, 1]
    dxx = cube[:, 1, 1, 2] - 2 * c + cube[:, 1, 1, 0]
    dsy = 0.25 * (
        cube[:, 2, 2, 1] - cube[:, 2, 0, 1] - cube[:, 0, 2, 1] + cube[:, 0, 0, 1]
    )
    dsx = 0.25 * (
        cube[:, 2, 1, 2] - cube[:, 2, 1, 0] - cube[:, 0, 1, 2] + cube[:, 0, 1, 0]
    )
    dyx = 0.25 * (
        cube[:, 1, 2, 2] - cube[:, 1, 2, 0] - cube[:, 1, 0, 2] + cube[:, 1, 0, 0]
    )
    Hmat = jnp.stack(
        [
            jnp.stack([dss, dsy, dsx], axis=-1),
            jnp.stack([dsy, dyy, dyx], axis=-1),
            jnp.stack([dsx, dyx, dxx], axis=-1),
        ],
        axis=-2,
    )  # (K, 3, 3)
    g = jnp.stack([gs, gy, gx], axis=-1)  # (K, 3)
    # Regularized solve; singular Hessians produce huge offsets -> rejected.
    eye = jnp.eye(3, dtype=dog.dtype) * 1e-6
    offset = -jnp.linalg.solve(Hmat + eye, g[..., None])[..., 0]
    contrast = c + 0.5 * jnp.sum(g * offset, axis=-1)
    S = config.n_scales_per_octave
    contrast_ok = jnp.abs(contrast) * S >= config.contrast_threshold
    # Edge test on the 2x2 spatial Hessian (Lowe's r = edge_threshold).
    tr = dxx + dyy
    det = dxx * dyy - dyx * dyx
    r = config.edge_threshold
    edge_ok = (det > 0) & (tr * tr * r < (r + 1.0) ** 2 * det)
    return offset, contrast, edge_ok & contrast_ok


def _refine_candidates(
    dog: jnp.ndarray,
    s: jnp.ndarray,
    y: jnp.ndarray,
    x: jnp.ndarray,
    config: FeatureConfig,
) -> Tuple[jnp.ndarray, ...]:
    """Iterative Newton refinement with integer re-walk (the masked,
    fixed-iteration form of OpenCV adjustLocalExtrema).

    OpenCV relocates the integer candidate by the rounded offset while any
    |offset| component exceeds 0.5 (up to 5 tries); round 1/2's single
    masked step instead REJECTED every extremum whose true subpixel location
    sits >0.6 px off-center — roughly a third of OpenCV's yield on the
    temple images (n_keypoints_mean 695 vs OpenCV's 1.5-3k, the upstream
    cause of the views-6-9 bridge starvation; reference detector call:
    src/Sfm.cpp:315-320). Two re-walk steps recover nearly all of them.

    Returns (s, y, x (relocated ints), offset (K,3), contrast, quality_ok,
    conv_ok).
    """
    S = config.n_scales_per_octave
    _, H, W = dog.shape
    border = 5
    for _ in range(2):
        offset, _, _ = _newton_step(dog, s, y, x, config)
        need = jnp.any(jnp.abs(offset) > 0.6, axis=-1) & jnp.all(
            jnp.isfinite(offset), axis=-1
        )
        ds = jnp.clip(jnp.round(offset[:, 0]), -1, 1).astype(jnp.int32)
        dy = jnp.clip(jnp.round(offset[:, 1]), -1, 1).astype(jnp.int32)
        dx = jnp.clip(jnp.round(offset[:, 2]), -1, 1).astype(jnp.int32)
        s = jnp.where(need, jnp.clip(s + ds, 0, S - 1), s)
        y = jnp.where(need, jnp.clip(y + dy, border, H - 1 - border), y)
        x = jnp.where(need, jnp.clip(x + dx, border, W - 1 - border), x)
    offset, contrast, quality_ok = _newton_step(dog, s, y, x, config)
    conv_ok = jnp.all(jnp.abs(offset) <= 0.6, axis=-1) & jnp.all(
        jnp.isfinite(offset), axis=-1
    )
    return s, y, x, offset, contrast, quality_ok, conv_ok


# ---------------------------------------------------------------------------
# Orientation + descriptor (per octave)
# ---------------------------------------------------------------------------

_ORI_PATCH_R = 15  # covers 4.5 * sigma for sigma <= ~3.3 (octave-relative)
_DESC_SAMPLES = 4  # samples per descriptor-bin axis -> 16x16 grid


def _gradient_stacks(gauss: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Central-difference gradients of each pyramid level. gauss: (L, H, W)."""
    gx = jnp.zeros_like(gauss)
    gx = gx.at[:, :, 1:-1].set(0.5 * (gauss[:, :, 2:] - gauss[:, :, :-2]))
    gy = jnp.zeros_like(gauss)
    gy = gy.at[:, 1:-1, :].set(0.5 * (gauss[:, 2:, :] - gauss[:, :-2, :]))
    return gx, gy


def _extract_patches(
    stack: jnp.ndarray,  # (L, H, W)
    level: jnp.ndarray,  # (K,) int
    y0: jnp.ndarray,  # (K,) int patch origins (pre-clamped)
    x0: jnp.ndarray,  # (K,)
    ph: int,
    pw: int,
) -> jnp.ndarray:
    """Per-keypoint (ph, pw) patches via batched dynamic_slice — contiguous
    block loads instead of random gathers."""

    def cut(l, yy, xx):
        return jax.lax.dynamic_slice(stack, (l, yy, xx), (1, ph, pw))[0]

    return jax.vmap(cut)(level, y0, x0)


def _bilinear_from_patch(
    patch: jnp.ndarray,  # (PH, PW)
    xs: jnp.ndarray,  # (S,) patch-local fractional coords
    ys: jnp.ndarray,  # (S,)
) -> jnp.ndarray:
    """Bilinear sampling as two hat-weight contractions (MXU work, zero
    gathers): the 1-D linear-interpolation weights of sample s against row
    r are exactly relu(1 - |ys_s - r|), so sampling = Wr @ patch then a
    row-wise dot with Wc. This is what took the descriptor stage off the
    TPU's scalar-gather path (201 ms -> MXU microseconds per image; the
    gathers were 75% of detect wall)."""
    PH, PW = patch.shape
    ys = jnp.clip(ys, 0.0, PH - 1.0)
    xs = jnp.clip(xs, 0.0, PW - 1.0)
    Wr = jnp.maximum(
        0.0, 1.0 - jnp.abs(ys[:, None] - jnp.arange(PH, dtype=patch.dtype))
    )  # (S, PH)
    Wc = jnp.maximum(
        0.0, 1.0 - jnp.abs(xs[:, None] - jnp.arange(PW, dtype=patch.dtype))
    )  # (S, PW)
    return jnp.sum((Wr @ patch) * Wc, axis=-1)


def _orientation(
    pgx: jnp.ndarray,
    pgy: jnp.ndarray,
    x: jnp.ndarray,
    y: jnp.ndarray,
    sigma_oct: jnp.ndarray,
    config: FeatureConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Top-2 gradient orientations per keypoint.

    pgx, pgy: (K, PH, PW) per-keypoint gradient patches; x, y, sigma_oct:
    (K,) PATCH-LOCAL keypoint geometry. Returns (angle1 (K,), angle2 (K,),
    has2 (K,)): the dominant orientation, the best secondary local-max
    peak, and whether that peak clears 0.8x the dominant one — OpenCV
    emits an extra keypoint per such peak (calcOrientationHist,
    mag_thr = 0.8*maxval; the reference's detector inherits this at
    src/Sfm.cpp:315-320), and round 1/2 dropped them, costing ~25-30%% of
    match density.
    """
    nbins = config.orientation_bins
    # Fixed 16x16 grid scaled by the keypoint's sigma (spacing ~0.56*sigma,
    # above the blurred image's Nyquist) instead of a 31x31 unit-spacing
    # patch: 3.75x fewer gathers, the detect stage's dominant cost.
    n = 16
    tlin = (jnp.arange(n, dtype=jnp.float32) + 0.5) / n * 2.0 - 1.0
    tv, tu = jnp.meshgrid(tlin, tlin, indexing="ij")
    tu = tu.reshape(-1)
    tv = tv.reshape(-1)
    t2 = tu * tu + tv * tv
    # Gaussian weight with sigma_w = 1.5*sigma over radius 4.5*sigma:
    # in normalized units exp(-(4.5 t)^2 / (2*1.5^2)) = exp(-4.5 t^2).
    w = jnp.where(t2 <= 1.0, jnp.exp(-4.5 * t2), 0.0)

    def peak_angle(sm, peak):
        lo = sm[(peak - 1) % nbins]
        hi = sm[(peak + 1) % nbins]
        ctr = sm[peak]
        denom = lo - 2.0 * ctr + hi
        interp = jnp.where(
            jnp.abs(denom) > 1e-12, 0.5 * (lo - hi) / denom, 0.0
        )
        fpeak = (peak.astype(jnp.float32) + interp) % nbins
        # Bin centers: bin b covers angle (-pi + 2pi*b/nbins).
        return (fpeak / nbins) * 2.0 * jnp.pi - jnp.pi

    def per_kp(pgx_k, pgy_k, x_k, y_k, sig_k):
        rad = 4.5 * sig_k
        xs = x_k + tu * rad
        ys = y_k + tv * rad
        gxs = _bilinear_from_patch(pgx_k, xs, ys)
        gys = _bilinear_from_patch(pgy_k, xs, ys)
        mag = jnp.sqrt(gxs * gxs + gys * gys)
        ang = jnp.arctan2(gys, gxs)  # [-pi, pi]
        fbin = (ang + jnp.pi) / (2.0 * jnp.pi) * nbins
        b0 = jnp.floor(fbin).astype(jnp.int32) % nbins
        fb = fbin - jnp.floor(fbin)
        hist = jnp.zeros((nbins,), jnp.float32)
        hist = hist.at[b0].add(w * mag * (1.0 - fb))
        hist = hist.at[(b0 + 1) % nbins].add(w * mag * fb)
        # Circular smoothing with [1,4,6,4,1]/16 (OpenCV calcOrientationHist).
        kern = jnp.asarray([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0
        sm = sum(
            kern[i] * jnp.roll(hist, i - 2) for i in range(5)
        )
        peak = jnp.argmax(sm)
        # Secondary peak: best circular local max at least 2 bins away from
        # the dominant one, qualifying at >= 0.8 * max (OpenCV semantics).
        bins = jnp.arange(nbins)
        is_local = (sm >= jnp.roll(sm, 1)) & (sm >= jnp.roll(sm, -1))
        d = jnp.abs(bins - peak)
        d = jnp.minimum(d, nbins - d)
        sm2 = jnp.where(is_local & (d >= 2), sm, -jnp.inf)
        peak2 = jnp.argmax(sm2)
        has2 = sm2[peak2] >= 0.8 * sm[peak]
        return peak_angle(sm, peak), peak_angle(sm, peak2), has2

    return jax.vmap(per_kp)(pgx, pgy, x, y, sigma_oct)


def _descriptors(
    pgx: jnp.ndarray,
    pgy: jnp.ndarray,
    x: jnp.ndarray,
    y: jnp.ndarray,
    sigma_oct: jnp.ndarray,
    angle: jnp.ndarray,
    config: FeatureConfig,
) -> jnp.ndarray:
    """128-d SIFT descriptors on a fixed rotated sample grid, sampled from
    per-keypoint gradient patches (x, y are PATCH-LOCAL).

    Standard SIFT geometry: 4x4 spatial bins of width 3*sigma each, 8
    orientation bins, Gaussian weighting with sigma = half the window,
    trilinear binning. Sampled on a fixed 16x16 grid (4 samples per bin
    axis) instead of every pixel in the circular window — the fixed-shape
    formulation (SURVEY.md §7 hard-part #2).
    """
    D = config.descriptor_width  # 4
    NB = config.descriptor_bins  # 8
    SS = _DESC_SAMPLES
    n = D * SS  # 16 samples per axis
    # Sample coords in bin units, centered: u in (-D/2, D/2).
    step = 1.0 / SS
    u = (jnp.arange(n, dtype=jnp.float32) + 0.5) * step - D / 2.0
    vv, uu = jnp.meshgrid(u, u, indexing="ij")  # (n, n)
    uu = uu.reshape(-1)
    vv = vv.reshape(-1)
    gauss_w = jnp.exp(-(uu * uu + vv * vv) / (2.0 * (D / 2.0) ** 2))

    def per_kp(pgx_k, pgy_k, x_k, y_k, sig_k, ang_k):
        hist_width = 3.0 * sig_k
        ca, sa = jnp.cos(ang_k), jnp.sin(ang_k)
        # Rotated sample offsets in octave pixels.
        ox = hist_width * (uu * ca - vv * sa)
        oy = hist_width * (uu * sa + vv * ca)
        gxs = _bilinear_from_patch(pgx_k, x_k + ox, y_k + oy)
        gys = _bilinear_from_patch(pgy_k, x_k + ox, y_k + oy)
        mag = jnp.sqrt(gxs * gxs + gys * gys)
        # Gradient angle relative to keypoint orientation.
        ang = jnp.arctan2(gys, gxs) - ang_k
        ang = jnp.mod(ang, 2.0 * jnp.pi)
        obin = ang / (2.0 * jnp.pi) * NB
        # Spatial bin coords in [ -0.5, D-0.5 ).
        ub = uu + D / 2.0 - 0.5
        vb = vv + D / 2.0 - 0.5
        u0 = jnp.floor(ub).astype(jnp.int32)
        v0 = jnp.floor(vb).astype(jnp.int32)
        o0 = jnp.floor(obin).astype(jnp.int32)
        fu = ub - u0
        fv = vb - v0
        fo = obin - o0
        w = mag * gauss_w
        desc = jnp.zeros((D + 1, D + 1, NB), jnp.float32)
        for dv_ in (0, 1):
            for du_ in (0, 1):
                for do_ in (0, 1):
                    wt = (
                        w
                        * jnp.where(dv_ == 1, fv, 1.0 - fv)
                        * jnp.where(du_ == 1, fu, 1.0 - fu)
                        * jnp.where(do_ == 1, fo, 1.0 - fo)
                    )
                    vi = jnp.clip(v0 + dv_, 0, D)
                    ui = jnp.clip(u0 + du_, 0, D)
                    # Mask out-of-range spatial bins (samples near the rim).
                    ok = (
                        (v0 + dv_ >= 0)
                        & (v0 + dv_ < D)
                        & (u0 + du_ >= 0)
                        & (u0 + du_ < D)
                    )
                    oi = (o0 + do_) % NB
                    desc = desc.at[vi, ui, oi].add(jnp.where(ok, wt, 0.0))
        vec = desc[:D, :D, :].reshape(-1)
        # Normalize, clip, renormalize (Lowe 2004 §6.1).
        norm = jnp.linalg.norm(vec) + 1e-12
        vec = jnp.minimum(vec / norm, 0.2)
        return vec / (jnp.linalg.norm(vec) + 1e-12)

    return jax.vmap(per_kp)(pgx, pgy, x, y, sigma_oct, angle)


# ---------------------------------------------------------------------------
# Full detector
# ---------------------------------------------------------------------------


def _detect_octave(
    gauss: jnp.ndarray,
    k_octave: int,
    config: FeatureConfig,
) -> Tuple[jnp.ndarray, ...]:
    """Detect (no description) up to k_octave refined extrema in one octave.

    gauss: (S+3, H, W) octave Gaussian stack. Returns per-candidate arrays
    in *octave-local* coordinates: (x, y, glevel (int), sigma_oct,
    |contrast|, valid). Description happens separately so that only
    SELECTED candidates pay the orientation/descriptor gathers (round 2
    described 4x2048 candidates per image to keep 2048 — the detect stage's
    dominant cost at ~450 ms/image on TPU).
    """
    S = config.n_scales_per_octave
    _, H, W = gauss.shape
    dog = gauss[1:] - gauss[:-1]  # (S+2, H, W)
    resp = _extrema_response(dog, config)  # (S, H, W)

    # Exclude the border (refinement + descriptor support need margin).
    border = 5
    mask = jnp.zeros((H, W), bool).at[border:-border, border:-border].set(True)
    resp = jnp.where(mask[None], resp, 0.0)

    # Candidate selection via block-max pre-reduction: a global top_k is a
    # full sort of S*H*W elements (~1 s/image on TPU for the 4 octaves);
    # max-pooling 4x4 blocks first shrinks the sort 16x and doubles as
    # spatial NMS (at most one candidate per 4x4 cell — near-duplicate
    # extrema are redundant anyway).
    B = 4
    Hp, Wp = -(-H // B) * B, -(-W // B) * B
    resp_p = jnp.pad(resp, ((0, 0), (0, Hp - H), (0, Wp - W)))
    bmax = jax.lax.reduce_window(
        resp_p, -jnp.inf, jax.lax.max, (1, B, B), (1, B, B), "VALID"
    )  # (S, Hp/B, Wp/B)
    nby, nbx = Hp // B, Wp // B
    k_red = min(k_octave, S * nby * nbx)
    vals, idx = jax.lax.top_k(bmax.reshape(-1), k_red)
    if k_red < k_octave:
        vals = jnp.pad(vals, (0, k_octave - k_red))
        idx = jnp.pad(idx, (0, k_octave - k_red))
    s = idx // (nby * nbx)
    rem = idx % (nby * nbx)
    by = rem // nbx
    bx = rem % nbx
    # Locate the argmax inside each winning block.
    oy = jnp.arange(B)
    ox = jnp.arange(B)
    cell_y = by[:, None, None] * B + oy[None, :, None]  # (K, B, 1)
    cell_x = bx[:, None, None] * B + ox[None, None, :]  # (K, 1, B)
    cell = resp_p[
        s[:, None, None],
        jnp.broadcast_to(cell_y, (k_octave, B, B)),
        jnp.broadcast_to(cell_x, (k_octave, B, B)),
    ].reshape(k_octave, B * B)
    local = jnp.argmax(cell, axis=-1)
    yy = by * B + local // B
    xx = bx * B + local % B
    yy = jnp.clip(yy, 0, H - 1)
    xx = jnp.clip(xx, 0, W - 1)
    cand_ok = vals > 0.0

    s, yy, xx, offset, contrast, quality_ok, conv_ok = _refine_candidates(
        dog, s, yy, xx, config
    )
    valid = cand_ok & quality_ok & conv_ok

    x_ref = xx.astype(jnp.float32) + offset[:, 2]
    y_ref = yy.astype(jnp.float32) + offset[:, 1]
    # DoG inner level s sits between gauss levels s+1 and s+2; its scale is
    # sigma0 * k^(s+1) (OpenCV: kpt scale uses (s + xi + 1) / nOctaveLayers).
    s_ref = s.astype(jnp.float32) + 1.0 + offset[:, 0]
    sigma_oct = config.sigma0 * (2.0 ** (s_ref / S))
    # Orientation/descriptor read the Gaussian level nearest the keypoint
    # scale: inner level s corresponds to gauss level s+1.
    glevel = jnp.clip(s + 1, 0, S + 1)
    return x_ref, y_ref, glevel, sigma_oct, jnp.abs(contrast), valid


def _describe_octave(
    gauss: jnp.ndarray,
    x: jnp.ndarray,
    y: jnp.ndarray,
    glevel: jnp.ndarray,
    sigma_oct: jnp.ndarray,
    resp: jnp.ndarray,
    valid: jnp.ndarray,
    config: FeatureConfig,
) -> Tuple[jnp.ndarray, ...]:
    """Orientation + descriptors for one octave's selected candidates.

    Emits 2 rows per candidate — dominant orientation and (masked) the
    secondary >= 0.8*max peak, OpenCV's multi-orientation semantics.
    Returns octave-local (x2, y2, sigma2, angle2, resp2, desc2, valid2)
    with leading dim 2*K.

    Sampling strategy: extract ONE (PH, PW) gradient patch per candidate
    (contiguous dynamic-slice loads), then all orientation/descriptor
    sampling happens via hat-weight contractions on the patch
    (_bilinear_from_patch) — the random-gather formulation ran at the
    TPU's scalar-gather rate and was 75% of detect wall (r3 profile).
    """
    S = config.n_scales_per_octave
    gx, gy = _gradient_stacks(gauss[: S + 2])
    _, H, W = gx.shape
    # Patch covers the descriptor window (radius ~8.5*sigma, sigma <= 4.6)
    # for all but the very largest-scale keypoints; rim samples of those
    # clamp to the patch edge where their Gaussian weight is negligible.
    PH = min(80, H)
    PW = min(128, W)
    y0 = jnp.clip(jnp.round(y).astype(jnp.int32) - PH // 2, 0, max(H - PH, 0))
    x0 = jnp.clip(jnp.round(x).astype(jnp.int32) - PW // 2, 0, max(W - PW, 0))
    pgx = _extract_patches(gx, glevel, y0, x0, PH, PW)  # (K, PH, PW)
    pgy = _extract_patches(gy, glevel, y0, x0, PH, PW)
    xl = x - x0.astype(x.dtype)
    yl = y - y0.astype(y.dtype)
    ang1, ang2, has2 = _orientation(pgx, pgy, xl, yl, sigma_oct, config)
    angles = jnp.concatenate([ang1, ang2])
    dup = lambda a: jnp.concatenate([a, a])  # noqa: E731
    x2, y2, sig2, resp2 = (dup(x), dup(y), dup(sigma_oct), dup(resp))
    valid2 = jnp.concatenate([valid, valid & has2])
    desc = _descriptors(
        dup(pgx), dup(pgy), dup(xl), dup(yl), sig2, angles, config
    )
    return x2, y2, sig2, angles, resp2, desc, valid2


# Fraction of the keypoint budget detected per octave: fine scales carry
# most stable SIFT keypoints; the tail octaves see few-pixel images.
# (Measured on temple: the 4x4 block-NMS, not these budgets, is what binds
# candidate counts — raising them changed yield by zero.)
_OCTAVE_BUDGET = (0.5, 0.25, 0.125, 0.125)


@functools.partial(jax.jit, static_argnums=(1, 2))
def _detect_impl(
    gray: jnp.ndarray, config: FeatureConfig, k_total: int
) -> Keypoints:
    S = config.n_scales_per_octave
    if config.upsample:
        base = _upsample2(gray)
        first_scale = 0.5
        init_blur = config.init_blur * 2.0
    else:
        base = gray
        first_scale = 1.0
        init_blur = config.init_blur
    sigma_diff = math.sqrt(max(config.sigma0**2 - init_blur**2, 0.01))
    base = gaussian_blur(base, sigma_diff)

    per_octave: List[Tuple[jnp.ndarray, ...]] = []
    octave_input = base
    scale = first_scale
    for o in range(config.n_octaves):
        if min(octave_input.shape) < 16:
            break
        frac = _OCTAVE_BUDGET[min(o, len(_OCTAVE_BUDGET) - 1)]
        k_oct = max(64, int(k_total * frac))
        gauss = build_gaussian_octave(octave_input, config)
        x, y, glevel, sig, resp, valid = _detect_octave(
            gauss, k_oct, config
        )
        # Compact before describing: refinement rejects ~50% of candidates
        # and the orientation/descriptor gathers are the detector's
        # dominant TPU cost (201 of ~270 ms/image, r3 measurement) — don't
        # pay them for dead rows. Validity fractions sit well under the
        # half-budget keep (measured 47% on temple octave 0).
        k_desc = max(64, k_oct // 2)
        _, sel = jax.lax.top_k(jnp.where(valid, resp, -1.0), k_desc)
        x, y, glevel, sig, resp, valid = (
            a[sel] for a in (x, y, glevel, sig, resp, valid)
        )
        x, y, sig, ang, resp, desc, valid = _describe_octave(
            gauss, x, y, glevel, sig, resp, valid, config
        )
        per_octave.append(
            (
                x * scale,
                y * scale,
                sig * scale,
                ang,
                resp,
                desc,
                valid,
            )
        )
        octave_input = _downsample2(gauss[S])
        scale *= 2.0

    xs = jnp.concatenate([p[0] for p in per_octave])
    ys = jnp.concatenate([p[1] for p in per_octave])
    sig = jnp.concatenate([p[2] for p in per_octave])
    ang = jnp.concatenate([p[3] for p in per_octave])
    resp = jnp.concatenate([p[4] for p in per_octave])
    desc = jnp.concatenate([p[5] for p in per_octave])
    valid = jnp.concatenate([p[6] for p in per_octave])

    score = jnp.where(valid, resp, -1.0)
    _, top = jax.lax.top_k(score, k_total)
    return Keypoints(
        xy=jnp.stack([xs[top], ys[top]], axis=-1),
        sigma=sig[top],
        angle=ang[top],
        response=resp[top],
        descriptors=desc[top],
        valid=valid[top],
    )


def detect_and_compute(
    gray: jnp.ndarray, config: FeatureConfig = FeatureConfig()
) -> Keypoints:
    """SIFT keypoints + descriptors for one grayscale image (H, W) in [0,1].

    Fixed output size config.max_keypoints with a validity mask. The jnp
    analogue of src/Sfm.cpp:315-327.
    """
    return _detect_impl(gray, config, config.max_keypoints)


@functools.partial(jax.jit, static_argnums=(1, 2))
def _detect_batch_impl(
    gray: jnp.ndarray, config: FeatureConfig, k_total: int
) -> Keypoints:
    return jax.lax.map(
        lambda img: _detect_impl(img, config, k_total), gray
    )


def detect_and_compute_batch(
    gray: jnp.ndarray, config: FeatureConfig = FeatureConfig()
) -> Keypoints:
    """Batched detection over (N, H, W) — the whole image set
    (reference loops images one by one at src/Sfm.cpp:283).

    Implemented as ONE dispatch with `lax.map` (a scan) over the batch: the
    compiled program is the single-image graph plus a loop, so compile cost
    matches the per-image program, but the whole stage pays one device
    round-trip instead of N. (A vmapped mega-graph instead stalls the TPU
    remote compiler for tens of minutes; a host loop pays ~N dispatches
    through the tunnel at ~0.5 s each.)
    """
    return _detect_batch_impl(gray, config, config.max_keypoints)
